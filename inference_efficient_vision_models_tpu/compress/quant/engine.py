"""QuantizationEngine: the live, reusable stage-4 API.

The reference shipped this surface twice: inline in `quantization/main.py`
(the used path, :172-314) and as a dead reusable class
(`quantization/engines.py:11-133`). Here there is one engine, and it is the
one the CLI uses.

Methods (reference parity):
  static_quantize       — per-channel-int8 weights + calibrated quint8
                          activations → true int8 MXU inference
  dynamic_quantize      — int8 dense (fc) layers with on-the-fly activation
                          quantization; convs stay fp32
                          (torch `quantize_dynamic({nn.Linear})`,
                          `quantization/main.py:247-251`)
  dynamic_quantize_fp16 / cast_fp16 — half-precision cast
                          (`quantization/main.py:253-262`); bf16 variant is
                          the TPU-native choice
  evaluate_accuracy / measure_latency — shared eval + timing harness
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...data.pipeline import Batches, normalize_images
from ...metrics.profile import latency_ms, model_size_bytes, throughput_ips
from ...models.widths import ResNetSpec
from ...utils import device_materialize
from .observers import quantize_weight_per_channel
from . import qmobilenet, qresnet


def quant_module(spec):
    """Family module for a spec — the quantization analog of
    models.registry.model_module. Each family module exposes the same API:
    fold / apply_folded / calibrate / convert_static_int8 / apply_int8 /
    serializable / restore_derived."""
    from ...models.efficientnet import EfficientNetSpec
    from ...models.mobilenet import MobileNetV2Spec
    from ...models.vit import ViTSpec

    if isinstance(spec, EfficientNetSpec):
        from . import qeffnet

        return qeffnet
    if isinstance(spec, MobileNetV2Spec):
        return qmobilenet
    if isinstance(spec, ViTSpec):
        from . import qvit

        return qvit
    return qresnet


def _dynamic_fc(feats, fcq):
    """Dynamic int8 dense: per-batch activation scale, int8 matmul."""
    lo = jnp.minimum(jnp.min(feats), 0.0)
    hi = jnp.maximum(jnp.max(feats), 0.0)
    scale = jnp.maximum((hi - lo) / 255.0, 1.2e-7)
    zp = jnp.clip(jnp.round(-lo / scale), 0, 255).astype(jnp.int32)
    x_s = (jnp.clip(jnp.round(feats / scale) + zp, 0, 255) - 128).astype(jnp.int8)
    acc = lax.dot_general(
        x_s, fcq["w_q"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc = acc - (zp - 128) * fcq["w_sum"]
    return acc.astype(jnp.float32) * (scale * fcq["w_scale"]) + fcq["bias"]


def s2d_preprocess(imgs: np.ndarray) -> np.ndarray:
    """Host-side space-to-depth (the static-int8 stem's input layout)."""
    from ...ops.space_to_depth import space_to_depth_u8

    return space_to_depth_u8(np.asarray(imgs))


def evaluate_accuracy_fn(cfg, apply_fn, test_d, host_preprocess=None) -> float:
    """Accuracy of any (u8 → logits) forward over the test split.

    ``apply_fn`` must already be an end-to-end compiled callable (every
    engine conversion returns ``partial(jitted_fn, model)``). It is NOT
    re-wrapped in jax.jit here: tracing through such a partial inlines the
    captured model pytree as program CONSTANTS, and lowering then pulls
    every leaf back to host (`mlir.ir_constant` → `array._value`) — tens of
    MB of D2H over the axon tunnel, observed to stall the whole stage for
    minutes (r4 faulthandler trace). The argmax runs on host instead; the
    logits are (batch, num_classes)-tiny.
    """
    loader = Batches(test_d[0], test_d[1], cfg.batch_size)
    correct = n = 0.0
    for i, (imgs, labels, mask) in enumerate(loader):
        if cfg.DEBUG_MODE and i == 2:
            break
        if host_preprocess is not None:
            imgs = host_preprocess(imgs)
        pred = np.asarray(apply_fn(jnp.asarray(imgs))).argmax(axis=-1)
        correct += ((pred == labels) * mask).sum()
        n += mask.sum()
    return float(correct / max(n, 1.0))


class QuantizationEngine:
    """Quantize a (possibly pruned) model given its spec + params + state."""

    def __init__(self, cfg, spec, params, state, logger):
        self.cfg = cfg
        self.spec = spec
        self.params = params
        self.state = state
        self.logger = logger
        self.q = quant_module(spec)
        self.folded = self.q.fold(spec, params, state)

    # -- conversions -------------------------------------------------------
    # Every conversion returns (model, apply_fn) with apply_fn taking RAW
    # uint8 NHWC images; preprocessing is part of each jitted graph (for the
    # static-int8 path it is folded into the stem conv entirely).

    def static_quantize(
        self,
        calib_data: Tuple[np.ndarray, np.ndarray],
        train_data: Tuple[np.ndarray, np.ndarray] | None = None,
        *,
        executor: str = "int8",
    ):
        """Calibrate on ≤cfg.calibration_images then convert to int8.
        The range estimator comes from cfg.observer
        ('minmax' | 'percentile' | 'entropy', see calib.calibrate_taps).
        With cfg.qat_epochs > 0 and ``train_data``, a quantization-aware
        fine-tune runs between calibration and conversion (see qat.py).
        ``executor='mixed'`` returns the mixed-precision forward (int8 1×1
        convs + bf16 depthwise, MBConv families only) over the SAME int8
        artifact — see qeffnet/qmobilenet.apply_int8_mixed; ``'bf16'``
        the bf16 activation-carrier forward (ViTs only) — see
        qvit.apply_int8_bf16."""
        loader = Batches(calib_data[0], calib_data[1], self.cfg.batch_size)
        observers = self.q.calibrate(
            self.spec,
            self.folded,
            loader,
            max_images=self.cfg.calibration_images,
            observer=getattr(self.cfg, "observer", "minmax"),
            percentile=getattr(self.cfg, "percentile", 99.99),
        )
        folded = self.folded
        qat_epochs = int(getattr(self.cfg, "qat_epochs", 0))
        if qat_epochs > 0 and train_data is not None:
            from .qat import qat_finetune

            self.logger.info("QAT fine-tune: %d epoch(s)", qat_epochs)
            folded = qat_finetune(
                self.spec, self.q, folded, observers, train_data,
                epochs=qat_epochs,
                lr=float(getattr(self.cfg, "qat_lr", 1e-5)),
                batch_size=self.cfg.batch_size,
                logger=self.logger,
                debug=self.cfg.DEBUG_MODE,
            )
        ada_iters = int(getattr(self.cfg, "adaround_iters", 0))
        if ada_iters > 0:
            from .adaround import adaround_refine

            self.logger.info("AdaRound: %d steps on the calibration split", ada_iters)
            folded = adaround_refine(
                self.spec, self.q, folded, observers, calib_data,
                iters=2 if self.cfg.DEBUG_MODE else ada_iters,
                lr=float(getattr(self.cfg, "adaround_lr", 1e-2)),
                batch_size=self.cfg.batch_size,
                reg_weight=float(getattr(self.cfg, "adaround_reg", 0.01)),
                logger=self.logger,
            )
        qmodel = self.q.convert_static_int8(
            self.spec, folded, observers,
            image_size=tuple(self.cfg.image_size),
        )
        qmodel = device_materialize(qmodel)
        spec, qmod = self.spec, self.q
        apply = qmod.apply_int8 if executor == "int8" else getattr(
            qmod, f"apply_int8_{executor}"
        )
        fn = jax.jit(lambda q, x: apply(spec, q, x))
        return qmodel, functools.partial(fn, qmodel)

    def dynamic_quantize(self):
        """Dynamic int8 — per family. CNNs: int8 fc only, convs stay folded
        fp32 (torch `quantize_dynamic({nn.Linear})` scope,
        `quantization/main.py:247-251`). ViTs: EVERY dense layer
        (qkv/proj/mlp/head) int8 with on-the-fly activation scales."""
        from ...models.vit import ViTSpec

        if isinstance(self.spec, ViTSpec):
            from . import qvit

            model = device_materialize(qvit.convert_dynamic_int8(self.spec, self.folded))
            spec = self.spec
            fn = jax.jit(
                lambda m, x_u8: qvit.apply_dynamic_int8(spec, m, normalize_images(x_u8))
            )
            return model, functools.partial(fn, model)
        w_q, w_scale = quantize_weight_per_channel(
            np.asarray(self.folded["fc"]["w"]), channel_axis=1
        )
        model = {k: v for k, v in self.folded.items() if k != "fc"}
        model["fc_q"] = {
            "w_q": w_q,
            "w_scale": w_scale,
            "w_sum": w_q.astype(np.int32).sum(axis=0),
            "bias": np.asarray(self.folded["fc"]["b"], np.float32),
        }
        model = device_materialize(model)
        spec, qmod = self.spec, self.q

        def fwd(m, x_u8):
            feats = qmod.apply_folded(
                spec, m, normalize_images(x_u8), return_features=True
            )
            return _dynamic_fc(feats, m["fc_q"])

        fn = jax.jit(fwd)
        return model, functools.partial(fn, model)

    def weight_only_quantize(
        self, dtype=jnp.bfloat16, bits: int = 8, train_data=None
    ):
        """W8A16 (bits=8, see wo8) / W4A16 (bits=4, see wo4): quantized
        weight storage dequantized to bf16 inside the jit. The TPU-native
        serving mode for families whose full-int8 path is bandwidth-bound
        below bf16 (MBConv nets): bf16 throughput at ~3.9× (int8) or ~7.4×
        (packed int4 + group scales) weight compression.

        With cfg.qat_epochs > 0 and ``train_data``, a grid-targeted
        quantization-aware fine-tune runs before conversion (see
        qat.w4_qat_finetune, bits ∈ {4, 8}): MBConv nets lose double digits
        under 4-bit round-to-nearest even with the int8-fallback policy (only
        training against the int4 grid recovers them), and the same recipe
        closes the ~1-pt W8A16 drop on MobileNetV2-class models."""
        import functools

        folded = self.folded
        qat_epochs = int(getattr(self.cfg, "qat_epochs", 0))
        if qat_epochs > 0 and train_data is not None:
            from .qat import w4_qat_finetune

            self.logger.info("W%d QAT fine-tune: %d epoch(s)", bits, qat_epochs)
            folded = w4_qat_finetune(
                self.spec, self.q, folded, train_data,
                epochs=qat_epochs,
                lr=float(getattr(self.cfg, "qat_lr", 1e-5)),
                batch_size=self.cfg.batch_size,
                bits=bits,
                logger=self.logger,
                debug=self.cfg.DEBUG_MODE,
            )
        if bits == 4:
            from . import wo4 as wo

            model = device_materialize(wo.convert_weight_only_int4(folded))
        else:
            from . import wo8 as wo

            model = device_materialize(wo.convert_weight_only(folded))
        spec, qmod = self.spec, self.q

        def fwd(m, x_u8):
            f = wo.dequantize(m, dtype)
            return qmod.apply_folded(
                spec, f, normalize_images(x_u8, dtype)
            ).astype(jnp.float32)

        return model, functools.partial(jax.jit(fwd), model)

    def cast_half(self, dtype=jnp.float16):
        """fp16 (parity) / bf16 (TPU-native) cast of the folded model."""
        model = jax.tree.map(
            lambda a: jnp.asarray(a).astype(dtype)
            if jnp.asarray(a).dtype == jnp.float32
            else jnp.asarray(a),
            self.folded,
        )
        model = device_materialize(model)
        spec, qmod = self.spec, self.q
        fn = jax.jit(
            lambda m, x_u8: qmod.apply_folded(
                spec, m, normalize_images(x_u8, dtype)
            ).astype(jnp.float32)
        )
        return model, functools.partial(fn, model)

    def dynamic_quantize_fp16(self):
        return self.cast_half(jnp.float16)

    # -- shared harness ----------------------------------------------------
    # ``host_preprocess`` is a host-side layout transform applied before the
    # device (e.g. space-to-depth for the static-int8 stem); it belongs to
    # the data pipeline, like decode.

    s2d_preprocess = staticmethod(s2d_preprocess)

    def static_preprocess(self, method: str):
        """Host-side layout transform for a method (None when not needed).
        Only the ResNet static-int8 stem consumes the space-to-depth layout;
        MobileNetV2's 3×3 stem takes raw u8 directly."""
        if method == "static_int8" and isinstance(self.spec, ResNetSpec):
            return s2d_preprocess
        return None

    def sensitivity(self, calib_data, eval_data=None):
        """Per-quantization-point sensitivity rows (quant/sensitivity.py):
        calibrate with cfg's observer, then fake-quant ONE tap at a time and
        record its isolated logit distortion vs the clean float forward —
        the measured basis for per-family mixed-precision choices."""
        from .sensitivity import tap_sensitivity

        loader = Batches(calib_data[0], calib_data[1], self.cfg.batch_size)
        observers = self.q.calibrate(
            self.spec,
            self.folded,
            loader,
            max_images=self.cfg.calibration_images,
            observer=getattr(self.cfg, "observer", "minmax"),
            percentile=getattr(self.cfg, "percentile", 99.99),
        )
        ev = eval_data if eval_data is not None else calib_data
        return tap_sensitivity(
            self.spec, self.q, self.folded, observers, ev,
            batch_size=self.cfg.batch_size, logger=self.logger,
        )

    def auto_mixed(self, calib_data, eval_data=None):
        """Automatic mixed-precision policy (quant/automix.py): rank taps by
        isolated sensitivity, then greedily exempt the top-k from activation
        quantization until the simulated static-int8 forward's top-1-vs-float
        flip rate meets cfg.automix_budget. Returns (float_taps, ladder) —
        the measured basis for choosing between all-int8 / family-mixed /
        W8A16 executors on a new architecture."""
        from .automix import auto_mixed_policy

        loader = Batches(calib_data[0], calib_data[1], self.cfg.batch_size)
        observers = self.q.calibrate(
            self.spec,
            self.folded,
            loader,
            max_images=self.cfg.calibration_images,
            observer=getattr(self.cfg, "observer", "minmax"),
            percentile=getattr(self.cfg, "percentile", 99.99),
        )
        ev = eval_data if eval_data is not None else calib_data
        return auto_mixed_policy(
            self.spec, self.q, self.folded, observers, ev,
            flip_budget=float(getattr(self.cfg, "automix_budget", 0.01)),
            max_float_taps=int(getattr(self.cfg, "automix_max_taps", 8)),
            batch_size=self.cfg.batch_size,
            logger=self.logger,
        )

    def evaluate_accuracy(self, apply_fn, test_d, host_preprocess=None) -> float:
        return evaluate_accuracy_fn(self.cfg, apply_fn, test_d, host_preprocess)

    def measure_latency(
        self, apply_fn, batch_size: int = 1, host_preprocess=None
    ) -> Dict[str, float]:
        h, w = self.cfg.image_size
        x = np.zeros((batch_size, h, w, 3), np.uint8)
        if host_preprocess is not None:
            x = host_preprocess(x)
        x = jnp.asarray(x)
        # no jax.jit(apply_fn) wrapper: see evaluate_accuracy_fn — re-jitting
        # the conversion partials would embed the model as lowering constants
        lat = latency_ms(apply_fn, x)
        lat["throughput_ips"] = throughput_ips(apply_fn, x, batch_size=batch_size)
        return lat

    def size_mb(self, model) -> float:
        # derived tensors (stem offset maps) are regenerable, not checkpoint
        # payload — measure the serializable view
        return model_size_bytes(self.q.serializable(model)) / 1e6


def float_stem_spec(spec):
    """(stem_key, stride, pad, act) of a family's folded stem / patch embed,
    or None for unknown specs."""
    from ...models.efficientnet import EfficientNetSpec
    from ...models.mobilenet import MobileNetV2Spec
    from ...models.vit import ViTSpec

    if isinstance(spec, ResNetSpec):
        return ("conv1", 2, 3, "relu")
    if isinstance(spec, EfficientNetSpec):
        return ("stem", 2, 1, "silu")
    if isinstance(spec, MobileNetV2Spec):
        return ("stem", 2, 1, "relu6")
    if isinstance(spec, ViTSpec):
        return ("patch_embed", spec.patch, 0, "none")
    return None


def u8_folded_forward(spec, folded, *, dtype=jnp.bfloat16, image_size=None):
    """Build a jittable ``(x_u8) -> logits`` over a folded float model with
    the normalize+stem prefix replaced by the s2d-folded uint8 stem
    (stemfold.make_float_stem_s2d): no 3-lane-minor tensor ever exists in
    the program. Input: raw (B, H, W, 3) uint8 or the (B, H/2, W/2, 12)
    s2d layout. CNN families only (ViT patch embeds keep their own fold)."""
    from . import stemfold

    qmod = quant_module(spec)
    cfg = float_stem_spec(spec)
    if cfg is None:
        raise TypeError(f"u8_folded_forward has no stem fold for {type(spec)}")
    key, stride, pad, act = cfg
    stem_fn = stemfold.make_float_stem_s2d(
        folded[key]["w"], folded[key]["b"], stride=stride, padding=pad,
        image_size=image_size, act=act, dtype=dtype,
    )
    cast = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, folded
    )

    def fwd(x_u8):
        return qmod.apply_folded(
            spec, cast, None, stem_out=stem_fn(x_u8)
        ).astype(jnp.float32)

    return fwd
