"""Quantized ViT: dynamic AND static INT8 — every dense layer on the MXU.

Goes beyond the reference (which quantizes only CNNs, while naming ViT
backbones in its configs — `kd_config.py:13-14`): a ViT's weight mass sits in
dense layers (qkv / proj / mlp / head), exactly the scope of torch's
``quantize_dynamic({nn.Linear})``. Weights are per-output-channel symmetric
int8; matmuls run int8×int8→int32 on the MXU; LayerNorm / softmax / GELU
stay floating point.

Two activation modes:
* **dynamic** — per-batch min/max activation scale computed on the fly
  (torch `quantize_dynamic` semantics),
* **static** — calibrated EMA observers fix each dense layer's input qparams
  at convert time (the stage-4 static path); additionally the ImageNet
  normalization folds into an int8 patch-embed conv so the device consumes
  RAW uint8 pixels (see stemfold — same trick as the CNN stems).

Exposes the family-module API the QuantizationEngine dispatches on:
fold / apply_folded / calibrate / convert_static_int8 / apply_int8 /
serializable / restore_derived.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...models import vit as vit_mod
from ...models.vit import LN_EPS, ViTSpec, _layer_norm
from ...ops.int8_matmul import int8_matmul_requant
from . import stemfold
from .observers import (
    ObserverState,
    minmax_qparams_affine,
    quantize_affine_shifted,
    quantize_weight_per_channel,
)

_DENSE = ("qkv", "proj", "mlp1", "mlp2")

# conversion transforms the patch-embed kernel (normalization fold,
# stemfold) before quantizing — AdaRound can't target its grid (adaround.py)
ADAROUND_SKIP = ("patch_embed",)


def _qdense_params(d) -> Dict:
    w = np.asarray(d["w"], np.float32)
    w_q, w_scale = quantize_weight_per_channel(w, channel_axis=1)
    return {
        "w_q": w_q,
        "w_scale": w_scale,
        "w_sum": w_q.astype(np.int32).sum(axis=0),
        "b": np.asarray(d["b"], np.float32),
    }


def convert_dynamic_int8(spec: ViTSpec, params) -> Dict:
    """fp32 ViT params → pytree with int8 dense layers (rest unchanged)."""
    q: Dict = {
        "patch_embed": jax.device_get(params["patch_embed"]),
        "cls_token": jax.device_get(params["cls_token"]),
        "pos_embed": jax.device_get(params["pos_embed"]),
        "norm": jax.device_get(params["norm"]),
        "head": _qdense_params({"w": params["head"]["w"], "b": params["head"]["b"]}),
        "blocks": {},
    }
    for i, blk in params["blocks"].items():
        q["blocks"][i] = {
            "ln1": jax.device_get(blk["ln1"]),
            "ln2": jax.device_get(blk["ln2"]),
            **{name: _qdense_params(blk[name]) for name in _DENSE},
        }
    return q


def _dyn_dense(x, qd, out_dtype=None):
    """(…, K) float → (…, N) x.dtype through a dynamic-int8 matmul.

    The int8 matmul accumulates in int32 and the affine algebra runs in
    fp32 regardless of the carrier dtype; only the returned activation is
    cast back (to ``out_dtype`` or ``x.dtype``)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    lo = jnp.minimum(jnp.min(x2), 0.0)
    hi = jnp.maximum(jnp.max(x2), 0.0)
    scale = jnp.maximum((hi - lo) / 255.0, 1.2e-7)
    zp = jnp.clip(jnp.round(-lo / scale), 0, 255).astype(jnp.int32)
    x_s = (jnp.clip(jnp.round(x2 / scale) + zp, 0, 255) - 128).astype(jnp.int8)
    acc = lax.dot_general(
        x_s, qd["w_q"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc = acc - (zp - 128) * qd["w_sum"]
    y = acc.astype(jnp.float32) * (scale * qd["w_scale"]) + qd["b"]
    return y.astype(out_dtype or x.dtype).reshape(*shape[:-1], -1)


def _int8_attention(qh, kh, vh, hd: int, act_dtype):
    """Shared attention tail for the int8 ViT executors.

    With ``act_dtype=float32`` everything (einsum accumulation, the
    (B,H,T,T) score tensor, softmax) is fp32 — bit-identical to the plain
    fp32 path, the reference protocol. With a 16-bit carrier the whole tail
    runs in the carrier dtype instead, exactly like the folded bf16 model
    (``apply_folded``): materializing the ~240 MB b256 score tensor in fp32
    and running an fp32 softmax over it costs ~1.7 ms/block of pure HBM
    traffic on one chip (scripts/vit_int8_decompose.py) — attention is
    bandwidth-bound, not precision-bound, and the MXU accumulates bf16
    products in fp32 internally either way."""
    if act_dtype == jnp.float32:
        att = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        att = jax.nn.softmax(att, axis=-1)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", att, vh, preferred_element_type=jnp.float32
        )
    qh, kh, vh = (t.astype(act_dtype) for t in (qh, kh, vh))
    att = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * jnp.asarray(hd**-0.5, act_dtype)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", att, vh)


def apply_dynamic_int8(spec: ViTSpec, q, x, act_dtype=jnp.float32):
    """Forward: NHWC fp32 images → fp32 logits; all dense layers int8.

    ``act_dtype`` is the inter-layer activation carrier (bf16 halves the
    HBM traffic of every LayerNorm/softmax/GELU/residual and runs the two
    attention einsums at bf16 MXU rate; quantization and dequantization of
    every dense layer still happen in fp32, accumulation in int32/fp32)."""
    pe = lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(q["patch_embed"]["w"]),
        (spec.patch, spec.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(q["patch_embed"]["b"])
    b = pe.shape[0]
    tokens = pe.reshape(b, -1, spec.dim)
    cls = jnp.broadcast_to(jnp.asarray(q["cls_token"]), (b, 1, spec.dim))
    h = (jnp.concatenate([cls, tokens], axis=1) + jnp.asarray(q["pos_embed"])).astype(
        act_dtype
    )

    hd = spec.head_dim
    for i in range(spec.depth):
        blk = q["blocks"][str(i)]
        heads = blk["qkv"]["w_q"].shape[1] // (3 * hd)  # head-pruned blocks ok
        z = _layer_norm(h, blk["ln1"])
        qkv = _dyn_dense(z, blk["qkv"]).reshape(b, -1, 3, heads, hd)
        qh, kh, vh = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
        out = _int8_attention(qh, kh, vh, hd, act_dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, heads * hd)
        h = h + _dyn_dense(out, blk["proj"])
        z = _layer_norm(h, blk["ln2"])
        z = jax.nn.gelu(_dyn_dense(z, blk["mlp1"]), approximate=False)
        h = h + _dyn_dense(z, blk["mlp2"])

    h = _layer_norm(h, q["norm"])
    return _dyn_dense(h[:, 0], q["head"], out_dtype=jnp.float32)


# --------------------------------------------------------------------------
# family-module API (engine dispatch)
# --------------------------------------------------------------------------


def fold(spec: ViTSpec, params, state) -> Dict:
    """ViTs have no BatchNorm — the 'folded' model is the fp32 param pytree."""
    return jax.tree.map(lambda a: np.asarray(a, np.float32), jax.device_get(params))


def apply_folded(
    spec: ViTSpec, folded, x, *, with_taps: bool = False,
    return_features: bool = False, tap_fn=None, stem_out=None,
):
    """fp32/half forward (compute dtype = x.dtype); optionally returns the
    activation taps at every dense-layer INPUT (static-int8 observers).

    ``tap_fn(name, t) -> t'`` intercepts every quantization point and its
    return value re-enters the flow (QAT fake-quant hook, see qat.py).
    ``stem_out`` (a precomputed patch-embed map) skips the normalize+patch
    conv prefix — the serving hook for the s2d-folded uint8 patch embed;
    serving-path only (incompatible with taps)."""
    if stem_out is not None:
        assert not with_taps and tap_fn is None, "stem_out is a serving-path hook"
        dtype = (
            stem_out.dtype
            if stem_out.dtype in (jnp.bfloat16, jnp.float16)
            else jnp.float32
        )
        out, _ = vit_mod.apply(
            spec, folded, {}, None, train=False, compute_dtype=dtype,
            return_features=return_features, patch_out=stem_out,
        )
        return out
    dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
    if not with_taps and tap_fn is None:
        out, _ = vit_mod.apply(
            spec, folded, {}, x, train=False, compute_dtype=dtype,
            return_features=return_features,
        )
        return out

    taps: Dict[str, jax.Array] = {}

    def tap(name, t):
        taps[name] = t
        return tap_fn(name, t) if tap_fn is not None else t

    x = tap("input", x)
    pe = lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(folded["patch_embed"]["w"]),
        (spec.patch, spec.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(folded["patch_embed"]["b"])
    b = pe.shape[0]
    tokens = pe.reshape(b, -1, spec.dim)
    cls = jnp.broadcast_to(jnp.asarray(folded["cls_token"]), (b, 1, spec.dim))
    h = jnp.concatenate([cls, tokens], axis=1) + jnp.asarray(folded["pos_embed"])

    hd = spec.head_dim
    for i in range(spec.depth):
        blk = folded["blocks"][str(i)]
        heads = blk["qkv"]["w"].shape[1] // (3 * hd)
        z = _layer_norm(h, blk["ln1"])
        z = tap(f"b{i}qkv", z)
        qkv = (z @ jnp.asarray(blk["qkv"]["w"])) + jnp.asarray(blk["qkv"]["b"])
        qkv = qkv.reshape(b, -1, 3, heads, hd)
        qh, kh, vh = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
        att = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * hd**-0.5, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, heads * hd)
        out = tap(f"b{i}proj", out)
        h = h + (out @ jnp.asarray(blk["proj"]["w"])) + jnp.asarray(blk["proj"]["b"])
        z = _layer_norm(h, blk["ln2"])
        z = tap(f"b{i}mlp1", z)
        z = jax.nn.gelu(
            (z @ jnp.asarray(blk["mlp1"]["w"])) + jnp.asarray(blk["mlp1"]["b"]),
            approximate=False,
        )
        z = tap(f"b{i}mlp2", z)
        h = h + (z @ jnp.asarray(blk["mlp2"]["w"])) + jnp.asarray(blk["mlp2"]["b"])

    h = _layer_norm(h, folded["norm"])
    feats = h[:, 0]
    feats = tap("head", feats)
    logits = (feats @ jnp.asarray(folded["head"]["w"])) + jnp.asarray(folded["head"]["b"])
    if with_taps:
        return logits, taps
    return logits


def calibrate(
    spec: ViTSpec, folded, batches, *, max_images: int = 256,
    averaging_constant=0.01, **observer_kw,
) -> Dict[str, ObserverState]:
    """Per-dense-layer-input range calibration over ≤max_images (reference
    budget, `quantization/main.py:157`); estimator selectable via observer_kw
    (observer='minmax'|'percentile'|'entropy', see calib.calibrate_taps)."""
    from .calib import calibrate_taps

    return calibrate_taps(
        apply_folded, spec, folded, batches, max_images=max_images,
        averaging_constant=averaging_constant, **observer_kw,
    )


def _static_dense_params(d, obs_in) -> Dict:
    w = np.asarray(d["w"], np.float32)
    w_q, w_scale = quantize_weight_per_channel(w, channel_axis=1)
    scale, zp = minmax_qparams_affine(obs_in.min, obs_in.max)
    return {
        "w_q": w_q,
        "w_scale": w_scale,
        "w_sum": w_q.astype(np.int32).sum(axis=0),
        "b": np.asarray(d["b"], np.float32),
        "in_scale": np.float32(scale),
        "in_zp": np.int32(zp),
    }


def convert_static_int8(
    spec: ViTSpec, folded, observers, *, fold_input: bool = True,
    image_size=(224, 224),
) -> Dict:
    """fp32 ViT + calibrated observers → static-int8 pytree: every dense
    layer carries fixed input qparams; the patch embed becomes a u8 int8
    conv with folded normalization."""
    q: Dict = {
        "cls_token": np.asarray(folded["cls_token"], np.float32),
        "pos_embed": np.asarray(folded["pos_embed"], np.float32),
        "norm": jax.tree.map(lambda a: np.asarray(a, np.float32), folded["norm"]),
        "head": _static_dense_params(folded["head"], observers["head"]),
        "blocks": {},
    }
    s_in, zp_in = minmax_qparams_affine(observers["input"].min, observers["input"].max)
    q["input"] = {"scale": np.float32(s_in), "zp": np.int32(zp_in)}
    if fold_input:
        q["patch_embed"] = stemfold.make_u8_stem(
            folded["patch_embed"]["w"], folded["patch_embed"]["b"],
            ObserverState(0.0, 0.0, True),  # output stays fp32 — no requant
            stride=spec.patch, padding=0, image_size=image_size,
        )
    else:
        q["patch_embed"] = jax.tree.map(
            lambda a: np.asarray(a, np.float32), folded["patch_embed"]
        )
    for i in range(spec.depth):
        blk = folded["blocks"][str(i)]
        q["blocks"][str(i)] = {
            "ln1": jax.tree.map(lambda a: np.asarray(a, np.float32), blk["ln1"]),
            "ln2": jax.tree.map(lambda a: np.asarray(a, np.float32), blk["ln2"]),
            "qkv": _static_dense_params(blk["qkv"], observers[f"b{i}qkv"]),
            "proj": _static_dense_params(blk["proj"], observers[f"b{i}proj"]),
            "mlp1": _static_dense_params(blk["mlp1"], observers[f"b{i}mlp1"]),
            "mlp2": _static_dense_params(blk["mlp2"], observers[f"b{i}mlp2"]),
        }
    return q


def serializable(qmodel: Dict) -> Dict:
    """The patch embed's E is a per-channel vector (VALID padding) — tiny,
    serialized as-is. Only a padded-stem offset MAP (w_fp present) would be
    derived; ViT patch embeds never have one."""
    pe = qmodel.get("patch_embed", {})
    if "w_fp" in pe and "e" in pe:
        pe = {k: v for k, v in pe.items() if k not in stemfold.DERIVED_KEYS}
        return {**qmodel, "patch_embed": pe}
    return qmodel


def restore_derived(qmodel: Dict) -> Dict:
    pe = qmodel.get("patch_embed", {})
    if "w_fp" in pe and "e" not in pe:
        return {**qmodel, "patch_embed": stemfold.restore_offsets(pe)}
    return qmodel


def _static_dense(x, qd, out_dtype=None, act=None):
    """(…, K) float → (…, N) x.dtype through a CALIBRATED int8 matmul.

    Quantization / affine dequantization run in fp32 whatever the carrier
    dtype; only the returned activation is cast (``out_dtype`` or
    ``x.dtype``). ``act='gelu'`` applies exact-erf GELU to the fp32
    dequantized output before the cast."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    x_s = quantize_affine_shifted(x2, qd["in_scale"], qd["in_zp"])
    acc = lax.dot_general(
        x_s, qd["w_q"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc = acc - (qd["in_zp"] - 128) * qd["w_sum"]
    y = acc.astype(jnp.float32) * (qd["in_scale"] * qd["w_scale"]) + qd["b"]
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(out_dtype or x.dtype).reshape(*shape[:-1], -1)


def _use_pallas_dense() -> bool:
    """Fused Pallas int8 dense on TPU; XLA composition elsewhere (Mosaic
    kernels don't lower on the CPU test backend). IEVM_VIT_PALLAS=0|1
    overrides."""
    force = os.environ.get("IEVM_VIT_PALLAS")
    if force is not None:
        return force == "1"
    return jax.default_backend() == "tpu"


def _static_dense_fast(x, qd, out_dtype=None, act=None):
    """bf16-carrier trunk dense: one fused Pallas kernel quantizes the tile
    in VMEM, runs the int8 MXU dot, the affine epilogue and (mlp1) the
    erf GELU — the int8 activation tensor never round-trips HBM and the
    GELU costs no separate elementwise pass (scripts/vit_pallas_tune.py).
    Without ``act`` the numerics match ``_static_dense`` bit-for-bit (same
    quantize → int32 dot → fp32 affine chain); with ``act='gelu'`` the
    in-kernel erf is an A&S 7.1.26 polynomial (max err 5e-7 — below the
    carrier's bf16 resolution, and ~300× below the downstream int8
    quantization step; vt1 fold accuracies are identical either way).
    Verified in tests/test_ops.py."""
    if not _use_pallas_dense():
        return _static_dense(x, qd, out_dtype, act=act)
    shape = x.shape
    k = shape[-1]
    # block heuristic from the tune sweep: whole-N blocks, deeper M tiles
    # for shallow K (VMEM: x bm*K + w K*N + out bm*N, all << 16 MB here)
    block_m = 512 if k >= 1024 else 1024
    y = int8_matmul_requant(
        x.reshape(-1, k), qd["w_q"], qd["w_scale"], qd["b"], qd["w_sum"],
        in_scale=qd["in_scale"], in_zp=qd["in_zp"], act=act,
        out_dtype=out_dtype or x.dtype,
        block_m=block_m, block_n=int(qd["w_q"].shape[1]),
    )
    return y.reshape(*shape[:-1], -1)


def _mlp_pair_fused(z, qd1, qd2, out_dtype):
    """mlp1(+GELU) → mlp2 with the intermediate kept INT8 in HBM.

    Closes the bandwidth lead identified in r3 (`scripts/vit_block_pieces.py`:
    ~18 ms of the 58.9 ms static-int8 ViT forward was per-dense
    quantize/requant HBM traffic): mlp1's Pallas epilogue requantizes
    straight to mlp2's calibrated input qparams, so the (B·T, 4·D) hidden —
    the largest activation in the network — is written and re-read as int8
    instead of bf16 (2× less traffic on that tensor), and mlp2's kernel
    skips its in-VMEM quantize. Numerics: identical chain except the
    intermediate skips one bf16 rounding (strictly less error than the
    unfused path).
    """
    shape = z.shape
    k = shape[-1]
    z8 = int8_matmul_requant(
        z.reshape(-1, k), qd1["w_q"], qd1["w_scale"], qd1["b"], qd1["w_sum"],
        in_scale=qd1["in_scale"], in_zp=qd1["in_zp"], act="gelu",
        out_scale=qd2["in_scale"], out_zp=qd2["in_zp"],
        block_m=512 if k >= 1024 else 1024, block_n=int(qd1["w_q"].shape[1]),
    )
    k2 = z8.shape[-1]
    y = int8_matmul_requant(
        z8, qd2["w_q"], qd2["w_scale"], qd2["b"], qd2["w_sum"],
        in_scale=qd2["in_scale"], in_zp=qd2["in_zp"], out_dtype=out_dtype,
        block_m=512 if k2 >= 1024 else 1024, block_n=int(qd2["w_q"].shape[1]),
    )
    return y.reshape(*shape[:-1], -1)


def _use_mlp_fuse() -> bool:
    """IEVM_VIT_MLP_FUSE=0 falls back to two independent Pallas denses."""
    return os.environ.get("IEVM_VIT_MLP_FUSE", "1") == "1"


def apply_int8(spec: ViTSpec, q, x, act_dtype=jnp.float32):
    """Static-INT8 ViT forward → fp32 logits.

    With a fold_input model (patch_embed carries "e"), ``x`` is RAW uint8
    NHWC; otherwise normalized fp32. Every dense layer (qkv/proj/mlp/head
    and the patch embed) runs int8 on the MXU with calibrated qparams.

    ``act_dtype`` is the inter-layer activation carrier. The default fp32
    reproduces the reference protocol bit-for-bit; ``bfloat16``
    (``apply_int8_bf16``, method suffix ``static_int8_bf16``) halves the
    HBM traffic of every LayerNorm / GELU / residual and runs the whole
    attention tail — einsums, score tensor, softmax — in bf16 like the
    folded bf16 model (see ``_int8_attention``; worth 1.32× end-to-end at
    b256, accuracy identical per fold on the vt1 protocol). The affine
    quant/dequant algebra and LayerNorm statistics stay fp32, matmul
    accumulation int32/fp32."""
    pe = q["patch_embed"]
    if "e" in pe:
        t = stemfold.apply_u8_stem(pe, x, stride=int(spec.patch), pad=0, act="none")
    else:
        t = lax.conv_general_dilated(
            x.astype(jnp.float32), jnp.asarray(pe["w"]),
            (spec.patch, spec.patch), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(pe["b"])
    b = t.shape[0]
    tokens = t.reshape(b, -1, spec.dim)
    cls = jnp.broadcast_to(jnp.asarray(q["cls_token"]), (b, 1, spec.dim))
    h = (jnp.concatenate([cls, tokens], axis=1) + jnp.asarray(q["pos_embed"])).astype(
        act_dtype
    )

    # fp32 carrier keeps the XLA composition (bit-exact reference protocol).
    # 16-bit carriers take the fused Pallas dense on TPU — but ONLY for the
    # adjacent mlp1/mlp2 pair: a Mosaic custom call acts as a scheduling
    # barrier against neighbouring XLA dots, and a measured placement A/B
    # (REPORT.md, scripts/vit_int8_decompose.py) shows pallas-everywhere is
    # ~2 ms/model SLOWER than pallas-for-the-MLPs-only (qkv/proj sit between
    # the XLA attention einsums and pay the transition tax).
    mlp_dense = _static_dense if act_dtype == jnp.float32 else _static_dense_fast

    hd = spec.head_dim
    for i in range(spec.depth):
        blk = q["blocks"][str(i)]
        heads = blk["qkv"]["w_q"].shape[1] // (3 * hd)
        z = _layer_norm(h, blk["ln1"])
        qkv = _static_dense(z, blk["qkv"]).reshape(b, -1, 3, heads, hd)
        qh, kh, vh = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
        out = _int8_attention(qh, kh, vh, hd, act_dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, heads * hd)
        h = h + _static_dense(out, blk["proj"])
        z = _layer_norm(h, blk["ln2"])
        if (
            act_dtype != jnp.float32
            and _use_pallas_dense()
            and _use_mlp_fuse()
        ):
            # int8-intermediate MLP pair (see _mlp_pair_fused)
            h = h + _mlp_pair_fused(z, blk["mlp1"], blk["mlp2"], act_dtype)
        else:
            z = mlp_dense(z, blk["mlp1"], act="gelu")
            h = h + mlp_dense(z, blk["mlp2"])

    h = _layer_norm(h, q["norm"])
    return _static_dense(h[:, 0], q["head"], out_dtype=jnp.float32)


def apply_int8_bf16(spec: ViTSpec, q, x):
    """The ``static_int8_bf16`` executor: same static-int8 artifact, bf16
    activation carrier — see ``apply_int8``'s docstring."""
    return apply_int8(spec, q, x, act_dtype=jnp.bfloat16)
