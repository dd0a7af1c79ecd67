"""Quantized ResNet: calibration taps, conversion, and the true-int8 forward.

This is the TPU-native replacement for the reference's FX graph-mode static
INT8 pipeline (`quantization/main.py:184-242`: prepare_fx → calibrate →
convert_fx → QNNPACK int8 kernels). Here:

* taps    — the folded fp32 model is run with activation taps at every
            quantization point (what prepare_fx's observers record),
* convert — weights → per-channel symmetric int8, activations → quint8
            affine qparams from the observers; BN is already folded,
* apply   — one jitted program whose convs run int8×int8→int32 on the MXU
            with a fused fp32 epilogue (dequant → bias → relu/add → requant).

Affine activation trick: quint8 values are stored shifted (q−128, int8).
Real zero-padding pads with the shifted zero-point, and the affine
correction reduces to a per-channel constant ``zp_s · Σw`` because padding
and interior then share the same offset:

    conv(x−zp) = conv_pad_{zp_s}(x_s) − zp_s · Σ_{hwi} w[...,oc]

so the int8 conv needs no position-dependent correction map.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...models.widths import ResNetSpec
from .fold import fold_conv_bn as fold  # family-module API (see engine)
from .observers import (
    ObserverState,
    dequantize_affine_shifted,
    minmax_qparams_affine,
    quantize_affine_shifted,
    quantize_weight_per_channel,
)

# conversion transforms the stem kernel (normalization fold + s2d repack,
# stemfold) before quantizing — AdaRound can't target its grid (adaround.py)
ADAROUND_SKIP = ("conv1",)

# --------------------------------------------------------------------------
# tap collection (on the folded fp32 model)
# --------------------------------------------------------------------------


def _conv_f32(x, w, b, stride, padding, relu, groups: int = 1):
    y = lax.conv_general_dilated(
        x, jnp.asarray(w),
        (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ) + jnp.asarray(b)
    return jax.nn.relu(y) if relu else y


def _max_pool(x, init):
    return lax.reduce_window(
        x, init, lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def apply_folded(
    spec: ResNetSpec, folded, x, *, with_taps: bool = False,
    return_features: bool = False, tap_fn=None, stem_out=None,
):
    """fp32 forward on the folded model; optionally returns activation taps
    or stops at the pooled features (pre-classifier).

    ``tap_fn(name, t) -> t'`` intercepts every quantization point (the same
    tap set convert_static_int8 consumes) and its return value re-enters the
    flow — the hook QAT uses to fake-quantize activations (see qat.py).
    ``stem_out`` (pre-maxpool stem activation) skips the normalize+stem
    prefix — the serving hook for the s2d-folded uint8 stem
    (stemfold.make_float_stem_s2d); ``x`` is then ignored."""
    taps: Dict[str, jax.Array] = {}

    def tap(name, t):
        taps[name] = t
        return tap_fn(name, t) if tap_fn is not None else t

    if stem_out is None:
        x = tap("input", x)
        t = _conv_f32(x, folded["conv1"]["w"], folded["conv1"]["b"], 2, 3, relu=True)
        t = tap("stem", t)
    else:
        t = stem_out
    t = _max_pool(t, -jnp.inf)

    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            blk = folded[f"layer{s + 1}"][str(b)]
            stride = spec.block_stride(s, b)
            identity = t
            if spec.block == "basic":
                h = _conv_f32(t, blk["conv1"]["w"], blk["conv1"]["b"], stride, 1, relu=True)
                h = tap(f"l{s}b{b}i0", h)
                h = _conv_f32(h, blk["conv2"]["w"], blk["conv2"]["b"], 1, 1, relu=False)
            else:
                h = _conv_f32(t, blk["conv1"]["w"], blk["conv1"]["b"], 1, 0, relu=True)
                h = tap(f"l{s}b{b}i0", h)
                h = _conv_f32(h, blk["conv2"]["w"], blk["conv2"]["b"], stride, 1,
                              relu=True, groups=spec.groups)
                h = tap(f"l{s}b{b}i1", h)
                h = _conv_f32(h, blk["conv3"]["w"], blk["conv3"]["b"], 1, 0, relu=False)
            if "down" in blk:
                identity = _conv_f32(t, blk["down"]["w"], blk["down"]["b"], stride, 0, relu=False)
            t = jax.nn.relu(h + identity)
            t = tap(f"l{s}b{b}o", t)

    feats = jnp.mean(t, axis=(1, 2))
    feats = tap("feat", feats)
    if return_features:
        return feats
    logits = feats @ jnp.asarray(folded["fc"]["w"]) + jnp.asarray(folded["fc"]["b"])
    if with_taps:
        return logits, taps
    return logits


def calibrate(
    spec: ResNetSpec, folded, batches, *, max_images: int = 256,
    averaging_constant=0.01, **observer_kw,
) -> Dict[str, ObserverState]:
    """Activation-range calibration over ≤max_images (reference budget,
    `quantization/main.py:157`); estimator selectable via observer_kw
    (observer='minmax'|'percentile'|'entropy', see calib.calibrate_taps)."""
    from .calib import calibrate_taps

    return calibrate_taps(
        apply_folded, spec, folded, batches, max_images=max_images,
        averaging_constant=averaging_constant, **observer_kw,
    )


# --------------------------------------------------------------------------
# conversion
# --------------------------------------------------------------------------


def _folded_input_stem(spec, folded, obs_out, image_size) -> Dict:
    """Stem conv with ImageNet-normalize folded in, consuming raw uint8.

    approx(u) = s_w ⊙ conv_{pad=-128}(u − 128, Wq) + bias + E
    where W' = W·k (k_c = 1/(255σ_c)), Wq = per-channel int8 of W', and the
    affine-offset map E (d-term + 128-shift, position-dependent at borders)
    is a DERIVED tensor: regenerated from the stored 37 KB fp stem kernel at
    load (see restore_stem_offsets), never serialized — checkpoints stay
    int8-sized. A space-to-depth stem variant (w4_q, ops/space_to_depth.py)
    is included for the TPU-friendly (H/2, W/2, 12) input layout; both
    variants share the epilogue qparams.
    """
    from ...data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from ...ops.space_to_depth import remap_stem_weights_s2d

    w = np.asarray(folded["conv1"]["w"], np.float32)  # (7,7,3,C)
    b = np.asarray(folded["conv1"]["b"], np.float32)
    k = 1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float32))
    w_prime = w * k.reshape(1, 1, 3, 1)
    w_q, w_scale = quantize_weight_per_channel(w_prime, channel_axis=3)
    w4_q, w4_scale = quantize_weight_per_channel(
        remap_stem_weights_s2d(w_prime), channel_axis=3
    )

    scale, zp = minmax_qparams_affine(obs_out.min, obs_out.max)
    stem = {
        "w_q": w_q,
        "w_scale": w_scale,
        # original folded stem kernel (x_f-space), 7·7·3·C ≈ 37 KB — the true
        # offset term conv(d, W) needs it; keeps E exact across save/load
        "w_fp": w.astype(np.float32),
        "bias": b,
        "w4_q": w4_q,
        "w4_scale": w4_scale,
        "input_hw": np.asarray(image_size, np.int32),
        "out_scale": np.float32(scale),
        "out_zp": np.int32(zp),
    }
    return restore_stem_offsets(stem)


STEM_DERIVED_KEYS = ("e", "e4")


def restore_stem_offsets(stem: Dict) -> Dict:
    """(Re)compute the derived affine-offset maps E / E4.

    The true conv term uses the exact fp stem kernel ``w_fp`` (37 KB, stored);
    the approx term under constant −128 padding is spatially constant:
        E = conv_zero-pad(d_img, w_fp) + 128·s_w·Σw_q
    Run on CPU at convert/load time; a few ms. Never serialized with the
    model (see ``serializable``).
    """
    from ...data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from ...ops.space_to_depth import remap_stem_weights_s2d

    d = -np.asarray(IMAGENET_MEAN, np.float32) / np.asarray(IMAGENET_STD, np.float32)
    h, wid = (int(v) for v in np.asarray(stem["input_hw"]))
    w_fp = np.asarray(stem["w_fp"], np.float32)
    w_q = np.asarray(stem["w_q"], np.float32)
    w_scale = np.asarray(stem["w_scale"], np.float32)
    w4_q = np.asarray(stem["w4_q"], np.float32)
    w4_scale = np.asarray(stem["w4_scale"], np.float32)

    with jax.default_device(jax.devices("cpu")[0]):
        d_img = jnp.broadcast_to(jnp.asarray(d), (1, h, wid, 3))
        conv_d = lax.conv_general_dilated(
            d_img, jnp.asarray(w_fp), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        e = np.asarray(conv_d, np.float32) + 128.0 * w_scale * w_q.sum(axis=(0, 1, 2))
        d12 = jnp.broadcast_to(jnp.asarray(np.tile(d, 4)), (1, h // 2, wid // 2, 12))
        conv_d4 = lax.conv_general_dilated(
            d12, jnp.asarray(remap_stem_weights_s2d(w_fp)), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        e4 = np.asarray(conv_d4, np.float32) + 128.0 * w4_scale * w4_q.sum(
            axis=(0, 1, 2)
        )
    return {**stem, "e": e.astype(np.float32), "e4": e4.astype(np.float32)}


def serializable(qmodel: Dict) -> Dict:
    """Checkpoint view of a static-int8 model: derived tensors stripped."""
    if "stem" not in qmodel or "e" not in qmodel.get("stem", {}):
        return qmodel
    stem = {k: v for k, v in qmodel["stem"].items() if k not in STEM_DERIVED_KEYS}
    return {**qmodel, "stem": stem}


def restore_derived(qmodel: Dict) -> Dict:
    """Inverse of ``serializable`` after msgpack restore."""
    if "stem" in qmodel and "input_hw" in qmodel["stem"] and "e" not in qmodel["stem"]:
        return {**qmodel, "stem": restore_stem_offsets(qmodel["stem"])}
    return qmodel


def _qconv_params(w, b, obs_out=None) -> Dict:
    w_q, w_scale = quantize_weight_per_channel(np.asarray(w), channel_axis=3)
    d = {
        "w_q": w_q,
        "w_scale": w_scale,
        "w_sum": w_q.astype(np.int32).sum(axis=(0, 1, 2)),
        "bias": np.asarray(b, np.float32),
    }
    if obs_out is not None:
        scale, zp = minmax_qparams_affine(obs_out.min, obs_out.max)
        d["out_scale"] = np.float32(scale)
        d["out_zp"] = np.int32(zp)
    return d


def convert_static_int8(
    spec: ResNetSpec, folded, observers, *, fold_input: bool = True,
    image_size: Tuple[int, int] = (224, 224),
) -> Dict:
    """Folded fp32 model + calibrated observers → int8 model pytree.

    ``fold_input=True`` (default) folds the ImageNet normalization into the
    stem conv so the network consumes RAW uint8 pixels: x_f = u·k_c + d_c is
    affine, hence conv(x_f, W) = conv(u−128, W·k) + E where E is a
    position-dependent constant (borders only) precomputed here. This
    removes the fp32 normalize+quantize over the (B,H,W,3) image — measured
    at 40% of the whole int8 forward on TPU (3-lane-minor elementwise is
    ~3/128 efficient) — and makes the input quantization EXACT (pixels are
    integers; scale 1, no rounding).
    """
    q: Dict = {}
    s_in, zp_in = minmax_qparams_affine(observers["input"].min, observers["input"].max)
    q["input"] = {"scale": np.float32(s_in), "zp": np.int32(zp_in)}
    if fold_input:
        q["stem"] = _folded_input_stem(spec, folded, observers["stem"], image_size)
    else:
        q["stem"] = _qconv_params(
            folded["conv1"]["w"], folded["conv1"]["b"], observers["stem"]
        )
    for s, depth in enumerate(spec.depths):
        lname = f"layer{s + 1}"
        q[lname] = {}
        for b in range(depth):
            blk = folded[lname][str(b)]
            out: Dict = {}
            if spec.block == "basic":
                out["conv1"] = _qconv_params(
                    blk["conv1"]["w"], blk["conv1"]["b"], observers[f"l{s}b{b}i0"]
                )
                out["conv2"] = _qconv_params(blk["conv2"]["w"], blk["conv2"]["b"])
            else:
                out["conv1"] = _qconv_params(
                    blk["conv1"]["w"], blk["conv1"]["b"], observers[f"l{s}b{b}i0"]
                )
                out["conv2"] = _qconv_params(
                    blk["conv2"]["w"], blk["conv2"]["b"], observers[f"l{s}b{b}i1"]
                )
                out["conv3"] = _qconv_params(blk["conv3"]["w"], blk["conv3"]["b"])
            if "down" in blk:
                out["down"] = _qconv_params(blk["down"]["w"], blk["down"]["b"])
            o_scale, o_zp = minmax_qparams_affine(
                observers[f"l{s}b{b}o"].min, observers[f"l{s}b{b}o"].max
            )
            out["out_scale"] = np.float32(o_scale)
            out["out_zp"] = np.int32(o_zp)
            q[lname][str(b)] = out

    f_scale, f_zp = minmax_qparams_affine(observers["feat"].min, observers["feat"].max)
    w_q, w_scale = quantize_weight_per_channel(np.asarray(folded["fc"]["w"]), channel_axis=1)
    q["fc"] = {
        "w_q": w_q,
        "w_scale": w_scale,
        "w_sum": w_q.astype(np.int32).sum(axis=0),
        "bias": np.asarray(folded["fc"]["b"], np.float32),
        "in_scale": np.float32(f_scale),
        "in_zp": np.int32(f_zp),
    }
    return q


# --------------------------------------------------------------------------
# true-int8 forward
# --------------------------------------------------------------------------


def _qconv_int8(x_s, zp, qc, stride: int, padding: int, groups: int = 1):
    """int8 conv with affine-input correction → fp32 (dequant + bias).

    x_s: shifted-int8 activations; zp: their (unshifted) zero point.
    Grouped convs (ResNeXt) need no extra correction: each output channel
    sees only its group's inputs and every input shares the same zero
    point, so the per-channel ``zp_s · Σw`` term is already exact.
    """
    zp_s = (zp - 128).astype(jnp.int8)
    if padding:
        x_s = jnp.pad(
            x_s,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            constant_values=zp_s,
        )
    acc = lax.conv_general_dilated(
        x_s,
        qc["w_q"],
        (stride, stride),
        [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    acc = acc - (zp - 128) * qc["w_sum"]
    return acc


def _epilogue(acc, in_scale, qc, relu: bool):
    y = acc.astype(jnp.float32) * (in_scale * qc["w_scale"]) + qc["bias"]
    return jax.nn.relu(y) if relu else y


def _requant(y, scale, zp):
    q = jnp.round(y / scale) + zp
    return (jnp.clip(q, 0, 255) - 128).astype(jnp.int8)


def _conv_q(x_s, zp, in_scale, qc, stride, padding, *, relu, requant, impl, interpret,
            groups: int = 1):
    """One quantized conv through the selected backend.

    impl="lax"    — XLA's native int8 convolution + fused fp32 epilogue
                    (DEFAULT: fastest end-to-end on current hardware).
    impl="pallas" — fused direct 3×3/s1 Pallas kernel (ops/conv3x3.py);
                    numerically equivalent, experimental perf.
    impl="im2col" — XLA patches + Pallas fused int8 matmul; equivalent but
                    HBM-bound by patch materialization.
    Returns requantized int8 or fp32. Grouped convs (ResNeXt conv2) always
    take the lax path — the Pallas/im2col kernels assume dense channels.
    """
    if groups > 1:
        y = _epilogue(_qconv_int8(x_s, zp, qc, stride, padding, groups), in_scale, qc, relu=relu)
        return _requant(y, qc["out_scale"], qc["out_zp"]) if requant else y
    if impl == "auto":
        # Route small-spatial layers through im2col + XLA int8 matmul.
        # NOTE: isolated-op microbenchmarks favored this for H≤14, but the
        # whole-model interleaved A/B measured it ~2× slower than "lax"
        # (patch materialization breaks XLA's conv-chain fusion) — kept as a
        # tested option; "lax" is the default for good reason.
        h_out = x_s.shape[1] // stride
        w_out = x_s.shape[2] // stride
        if h_out * w_out <= 256:
            from ...ops import conv_int8_im2col

            return conv_int8_im2col(
                x_s, qc["w_q"], qc["w_scale"], qc["bias"], qc["w_sum"],
                stride=stride, padding=padding,
                in_scale=in_scale, in_zp=zp, relu=relu,
                out_scale=qc["out_scale"] if requant else None,
                out_zp=qc["out_zp"] if requant else None,
                backend="xla",
            )
        impl = "lax"
    if impl == "pallas" and qc["w_q"].shape[:2] == (3, 3) and stride == 1 and padding == 1:
        from ...ops import conv3x3_s1_int8

        return conv3x3_s1_int8(
            x_s, qc["w_q"], qc["w_scale"], qc["bias"], qc["w_sum"],
            in_scale=in_scale, in_zp=zp, relu=relu,
            out_scale=qc["out_scale"] if requant else None,
            out_zp=qc["out_zp"] if requant else None,
            interpret=interpret,
        )
    if impl == "im2col":
        from ...ops import conv_int8_im2col

        return conv_int8_im2col(
            x_s, qc["w_q"], qc["w_scale"], qc["bias"], qc["w_sum"],
            stride=stride, padding=padding,
            in_scale=in_scale, in_zp=zp, relu=relu,
            out_scale=qc["out_scale"] if requant else None,
            out_zp=qc["out_zp"] if requant else None,
            interpret=interpret,
        )
    y = _epilogue(_qconv_int8(x_s, zp, qc, stride, padding), in_scale, qc, relu=relu)
    if requant:
        return _requant(y, qc["out_scale"], qc["out_zp"])
    return y


def apply_int8(spec: ResNetSpec, q, x, *, impl: str = "lax", interpret: bool = False):
    """Static-INT8 inference → logits. One XLA program; every conv is int8
    on the MXU, epilogues are fused VPU fp32.

    Input: with a fold_input-converted model (stem carries "e"), ``x`` is
    RAW uint8 images — normalization is inside the stem conv. With a legacy
    model, ``x`` is normalized fp32 and gets affine-quantized here.
    ``impl`` selects the conv backend per _conv_q (XLA lax vs Pallas im2col).
    """
    kw = dict(impl=impl, interpret=interpret)
    stem = q["stem"]
    if "e4" in stem and x.shape[-1] == 3 and x.dtype == jnp.uint8:
        # raw uint8 in, e4 stem available: relayout on device (XLA fuses the
        # transpose into the stem conv's operand read) rather than running
        # the 3-lane-minor 7x7 "e" path (~45% forward overhead) or requiring
        # host-side s2d (numpy: 10x one chip forward per batch on one core).
        from ...ops.space_to_depth import space_to_depth_device

        x = space_to_depth_device(x)
    if "e4" in stem and x.shape[-1] == stem["w4_q"].shape[2]:
        # space-to-depth input (B, H/2, W/2, 12): the host/data pipeline
        # emits this layout; the device never sees a 3-lane-minor tensor.
        x_s = (x.astype(jnp.int32) - 128).astype(jnp.int8)
        x_p = jnp.pad(
            x_s, ((0, 0), (2, 1), (2, 1), (0, 0)), constant_values=jnp.int8(-128)
        )
        acc = lax.conv_general_dilated(
            x_p, stem["w4_q"], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * stem["w4_scale"] + stem["bias"] + stem["e4"]
        cur = _requant(jax.nn.relu(y), stem["out_scale"], stem["out_zp"])
    elif "e" in stem:
        # integer input path: u8 → u−128 (exact), pad −128, E-corrected epilogue
        x_s = (x.astype(jnp.int32) - 128).astype(jnp.int8)
        x_p = jnp.pad(
            x_s, ((0, 0), (3, 3), (3, 3), (0, 0)), constant_values=jnp.int8(-128)
        )
        acc = lax.conv_general_dilated(
            x_p, stem["w_q"], (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * stem["w_scale"] + stem["bias"] + stem["e"]
        cur = _requant(jax.nn.relu(y), stem["out_scale"], stem["out_zp"])
    else:
        in_scale, in_zp = q["input"]["scale"], q["input"]["zp"]
        x_s = quantize_affine_shifted(x, in_scale, in_zp)
        cur = _conv_q(x_s, in_zp, in_scale, stem, 2, 3, relu=True, requant=True, **kw)
    cur_scale, cur_zp = stem["out_scale"], stem["out_zp"]
    cur = _max_pool(cur, jnp.int8(-128))  # monotonic: exact in q-domain

    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            blk = q[f"layer{s + 1}"][str(b)]
            stride = spec.block_stride(s, b)
            in_s, in_z = cur_scale, cur_zp
            x_in = cur
            if spec.block == "basic":
                a_q = _conv_q(x_in, in_z, in_s, blk["conv1"], stride, 1,
                              relu=True, requant=True, **kw)
                h = _conv_q(a_q, blk["conv1"]["out_zp"], blk["conv1"]["out_scale"],
                            blk["conv2"], 1, 1, relu=False, requant=False, **kw)
            else:
                a_q = _conv_q(x_in, in_z, in_s, blk["conv1"], 1, 0,
                              relu=True, requant=True, **kw)
                b_q = _conv_q(a_q, blk["conv1"]["out_zp"], blk["conv1"]["out_scale"],
                              blk["conv2"], stride, 1, relu=True, requant=True,
                              groups=spec.groups, **kw)
                h = _conv_q(b_q, blk["conv2"]["out_zp"], blk["conv2"]["out_scale"],
                            blk["conv3"], 1, 0, relu=False, requant=False, **kw)
            if "down" in blk:
                identity = _conv_q(x_in, in_z, in_s, blk["down"], stride, 0,
                                   relu=False, requant=False, **kw)
            else:
                identity = dequantize_affine_shifted(x_in, in_s, in_z)
            t = jax.nn.relu(h + identity)
            cur = _requant(t, blk["out_scale"], blk["out_zp"])
            cur_scale, cur_zp = blk["out_scale"], blk["out_zp"]

    feats = jnp.mean(dequantize_affine_shifted(cur, cur_scale, cur_zp), axis=(1, 2))
    fc = q["fc"]
    f_q = quantize_affine_shifted(feats, fc["in_scale"], fc["in_zp"])
    acc = lax.dot_general(
        f_q, fc["w_q"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc = acc - (fc["in_zp"] - 128) * fc["w_sum"]
    logits = acc.astype(jnp.float32) * (fc["in_scale"] * fc["w_scale"]) + fc["bias"]
    return logits
