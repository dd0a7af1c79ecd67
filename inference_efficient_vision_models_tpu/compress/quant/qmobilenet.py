"""Quantized MobileNetV2: calibration taps, conversion, true-int8 forward.

Extends the static-INT8 pipeline (reference FX graph-mode flow,
`quantization/main.py:184-242`) beyond ResNets: every 1×1/3×3 conv —
INCLUDING the depthwise convs — runs int8×int8→int32 with a fused fp32
epilogue (dequant → bias → relu6/add → requant). The depthwise affine
correction uses the same per-channel ``zp_s · Σw`` constant as dense convs:
each output channel's receptive field covers exactly its own input channel,
and padding carries the shifted zero-point.

Same module API as qresnet (fold / apply_folded / calibrate /
convert_static_int8 / apply_int8 / serializable / restore_derived) so the
QuantizationEngine dispatches per model family.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...models.mobilenet import MobileNetV2Spec
from . import stemfold
from .fold import fold_mbv2 as fold
from .observers import (
    ObserverState,
    dequantize_affine_shifted,
    minmax_qparams_affine,
    quantize_affine_shifted,
    quantize_weight_per_channel,
)

__all__ = [
    "fold", "apply_folded", "calibrate", "convert_static_int8", "apply_int8",
    "apply_int8_mixed", "serializable", "restore_derived",
]

# conversion transforms the stem kernel (normalization fold, stemfold)
# before quantizing — AdaRound can't target its grid (adaround.py)
ADAROUND_SKIP = ("stem",)


# --------------------------------------------------------------------------
# folded fp32 forward (with activation taps for calibration)
# --------------------------------------------------------------------------


def _conv_f32(x, w, b, stride, padding, *, groups=1, relu6=False):
    y = lax.conv_general_dilated(
        x, jnp.asarray(w),
        (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ) + jnp.asarray(b)
    if relu6:
        y = jnp.minimum(jax.nn.relu(y), 6.0)
    return y


def apply_folded(
    spec: MobileNetV2Spec, folded, x, *, with_taps: bool = False,
    return_features: bool = False, tap_fn=None, stem_out=None,
):
    """fp32 forward on the folded model; optionally returns activation taps
    (the quantization points) or stops at pooled features.

    ``tap_fn(name, t) -> t'`` intercepts every quantization point and its
    return value re-enters the flow (QAT fake-quant hook, see qat.py).
    ``stem_out`` skips the normalize+stem prefix (s2d-folded uint8 stem,
    stemfold.make_float_stem_s2d); ``x`` is then ignored."""
    taps: Dict[str, jax.Array] = {}

    def tap(name, t):
        taps[name] = t
        return tap_fn(name, t) if tap_fn is not None else t

    if stem_out is None:
        x = tap("input", x)
        t = _conv_f32(x, folded["stem"]["w"], folded["stem"]["b"], 2, 1, relu6=True)
        t = tap("stem", t)
    else:
        t = stem_out

    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            blk = folded[f"stage{s}"][str(b)]
            stride = spec.block_stride(s, b)
            h = t
            if spec.has_expand[s][b]:
                h = _conv_f32(h, blk["expand"]["w"], blk["expand"]["b"], 1, 0, relu6=True)
                h = tap(f"s{s}b{b}e", h)
            h = _conv_f32(
                h, blk["dw"]["w"], blk["dw"]["b"], stride, 1,
                groups=int(blk["dw"]["w"].shape[3]), relu6=True,
            )
            h = tap(f"s{s}b{b}d", h)
            h = _conv_f32(h, blk["project"]["w"], blk["project"]["b"], 1, 0)
            if spec.has_residual(s, b):
                h = h + t
            h = tap(f"s{s}b{b}o", h)
            t = h

    t = _conv_f32(t, folded["last"]["w"], folded["last"]["b"], 1, 0, relu6=True)
    t = tap("head", t)
    feats = jnp.mean(t, axis=(1, 2))
    feats = tap("feat", feats)
    if return_features:
        return feats
    logits = feats @ jnp.asarray(folded["fc"]["w"]) + jnp.asarray(folded["fc"]["b"])
    if with_taps:
        return logits, taps
    return logits


def calibrate(
    spec: MobileNetV2Spec, folded, batches, *, max_images: int = 256,
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
    spec: MobileNetV2Spec, folded, observers, *, fold_input: bool = True,
    image_size=(224, 224),
) -> Dict:
    """Folded fp32 model + calibrated observers → int8 model pytree.

    ``fold_input=True``: ImageNet normalization folds into the stem so the
    network consumes RAW uint8 (see stemfold; exact input quantization)."""
    q: Dict = {}
    s_in, zp_in = minmax_qparams_affine(observers["input"].min, observers["input"].max)
    q["input"] = {"scale": np.float32(s_in), "zp": np.int32(zp_in)}
    if fold_input:
        q["stem"] = stemfold.make_u8_stem(
            folded["stem"]["w"], folded["stem"]["b"], observers["stem"],
            stride=2, padding=1, image_size=image_size,
        )
    else:
        q["stem"] = _qconv_params(folded["stem"]["w"], folded["stem"]["b"], observers["stem"])

    for s, depth in enumerate(spec.depths):
        sname = f"stage{s}"
        q[sname] = {}
        for b in range(depth):
            blk = folded[sname][str(b)]
            out: Dict = {}
            if spec.has_expand[s][b]:
                out["expand"] = _qconv_params(
                    blk["expand"]["w"], blk["expand"]["b"], observers[f"s{s}b{b}e"]
                )
            out["dw"] = _qconv_params(
                blk["dw"]["w"], blk["dw"]["b"], observers[f"s{s}b{b}d"]
            )
            out["project"] = _qconv_params(blk["project"]["w"], blk["project"]["b"])
            o_scale, o_zp = minmax_qparams_affine(
                observers[f"s{s}b{b}o"].min, observers[f"s{s}b{b}o"].max
            )
            out["out_scale"] = np.float32(o_scale)
            out["out_zp"] = np.int32(o_zp)
            q[sname][str(b)] = out

    q["last"] = _qconv_params(folded["last"]["w"], folded["last"]["b"], observers["head"])

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


def serializable(qmodel: Dict) -> Dict:
    """Checkpoint view: derived stem offset map stripped."""
    if "stem" in qmodel and "e" in qmodel["stem"]:
        stem = {k: v for k, v in qmodel["stem"].items() if k not in stemfold.DERIVED_KEYS}
        return {**qmodel, "stem": stem}
    return qmodel


def restore_derived(qmodel: Dict) -> Dict:
    """Inverse of ``serializable`` after msgpack restore."""
    if "stem" in qmodel and "w_fp" in qmodel["stem"] and "e" not in qmodel["stem"]:
        return {**qmodel, "stem": stemfold.restore_offsets(qmodel["stem"])}
    return qmodel


# --------------------------------------------------------------------------
# true-int8 forward
# --------------------------------------------------------------------------


def _qconv_int8(x_s, zp, qc, stride: int, padding: int, groups: int = 1):
    """int8 conv (dense or depthwise) with affine-input correction → int32.

    Depthwise (groups == C): backend-dependent lowering (ops/dwconv_int8) —
    k² shifted multiply-adds off-TPU (XLA:CPU's int8 grouped-conv emulation
    is pathologically slow), the native grouped conv on TPU. Both are
    integer-exact and interchangeable."""
    zp_s = (zp - 128).astype(jnp.int8)
    if padding:
        x_s = jnp.pad(
            x_s,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            constant_values=zp_s,
        )
    if groups > 1:
        from ...ops.dwconv_int8 import depthwise_conv_int8, prefer_shift_lowering

        if prefer_shift_lowering():
            acc = depthwise_conv_int8(x_s, qc["w_q"], stride)
            return acc - (zp - 128) * qc["w_sum"]
    acc = lax.conv_general_dilated(
        x_s, qc["w_q"], (stride, stride), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return acc - (zp - 128) * qc["w_sum"]


def _requant(y, scale, zp):
    q = jnp.round(y / scale) + zp
    return (jnp.clip(q, 0, 255) - 128).astype(jnp.int8)


def _conv_q(x_s, zp, in_scale, qc, stride, padding, *, groups=1, relu6, requant):
    acc = _qconv_int8(x_s, zp, qc, stride, padding, groups=groups)
    y = acc.astype(jnp.float32) * (in_scale * qc["w_scale"]) + qc["bias"]
    if relu6:
        y = jnp.minimum(jax.nn.relu(y), 6.0)
    if requant:
        return _requant(y, qc["out_scale"], qc["out_zp"])
    return y


def block_int8(blk, x_in, in_s, in_z, *, kernel, stride, residual):
    """One inverted-residual block of the unfused int8 op chain → int8 in
    the block-out domain. Shared by ``apply_int8`` and ``fusedpath`` (which
    falls back to this for stride-2 blocks: Mosaic restricts strided vector
    slices)."""
    h, h_s, h_z = x_in, in_s, in_z
    if "expand" in blk:
        h = _conv_q(h, h_z, h_s, blk["expand"], 1, 0, relu6=True, requant=True)
        h_s, h_z = blk["expand"]["out_scale"], blk["expand"]["out_zp"]
    h = _conv_q(
        h, h_z, h_s, blk["dw"], stride, (kernel - 1) // 2,
        groups=int(blk["dw"]["w_q"].shape[3]), relu6=True, requant=True,
    )
    h_s, h_z = blk["dw"]["out_scale"], blk["dw"]["out_zp"]
    h = _conv_q(h, h_z, h_s, blk["project"], 1, 0, relu6=False, requant=False)
    if residual:
        h = h + dequantize_affine_shifted(x_in, in_s, in_z)
    return _requant(h, blk["out_scale"], blk["out_zp"])


def _dwconv_bf16(h, h_s, h_z, qc, kernel: int, stride: int):
    """Depthwise conv of the MIXED path: int8 input dequantized in-graph
    (XLA fuses the affine into the conv read), bf16 weights/compute, fp32
    accumulate + bias. Zero-padding is exact: dequant(zp) == 0."""
    pad = (kernel - 1) // 2
    h_f = dequantize_affine_shifted(h, h_s, h_z).astype(jnp.bfloat16)
    w = (qc["w_q"].astype(jnp.float32) * qc["w_scale"]).astype(jnp.bfloat16)
    acc = lax.conv_general_dilated(
        h_f, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=int(qc["w_q"].shape[3]),
        preferred_element_type=jnp.float32,
    )
    return acc + qc["bias"]


def block_mixed(blk, x_in, in_s, in_z, *, kernel, stride, residual):
    """MIXED-precision inverted-residual block: the 1×1 expand/project stay
    int8 (MXU at 2× the bf16 MAC rate — they carry ~90% of the FLOPs), the
    depthwise conv runs bf16 (REPORT.md's roofline blames the int8 dw
    requant/dequant HBM round-trips for full-int8 losing to bf16 on the
    MBConv families). Same calibrated activation domains as block_int8."""
    h, h_s, h_z = x_in, in_s, in_z
    if "expand" in blk:
        h = _conv_q(h, h_z, h_s, blk["expand"], 1, 0, relu6=True, requant=True)
        h_s, h_z = blk["expand"]["out_scale"], blk["expand"]["out_zp"]
    y = jnp.clip(_dwconv_bf16(h, h_s, h_z, blk["dw"], kernel, stride), 0.0, 6.0)
    h = _requant(y, blk["dw"]["out_scale"], blk["dw"]["out_zp"])
    h = _conv_q(
        h, blk["dw"]["out_zp"], blk["dw"]["out_scale"], blk["project"], 1, 0,
        relu6=False, requant=False,
    )
    if residual:
        h = h + dequantize_affine_shifted(x_in, in_s, in_z)
    return _requant(h, blk["out_scale"], blk["out_zp"])


def apply_int8(spec: MobileNetV2Spec, q, x):
    """Static-INT8 inference → logits. Every conv (incl. depthwise) is int8
    on-device; epilogues are fused fp32 VPU ops.

    With a fold_input model (stem carries "e"), ``x`` is RAW uint8 NHWC;
    otherwise normalized fp32 (affine-quantized here)."""
    return _apply_with_blocks(spec, q, x, block_int8)


def apply_int8_mixed(spec: MobileNetV2Spec, q, x):
    """MIXED-precision executor over the SAME static-int8 artifact: int8
    1×1 convs + bf16 depthwise (see block_mixed). Pick per deployment —
    no re-calibration or new artifact needed."""
    return _apply_with_blocks(spec, q, x, block_mixed)


def _apply_with_blocks(spec: MobileNetV2Spec, q, x, block_fn):
    stem = q["stem"]
    if "e" in stem:
        y = stemfold.apply_u8_stem(stem, x, stride=2, pad=1, relu6=True)
        cur = _requant(y, stem["out_scale"], stem["out_zp"])
    else:
        in_scale, in_zp = q["input"]["scale"], q["input"]["zp"]
        x_s = quantize_affine_shifted(x, in_scale, in_zp)
        cur = _conv_q(x_s, in_zp, in_scale, stem, 2, 1, relu6=True, requant=True)
    cur_scale, cur_zp = stem["out_scale"], stem["out_zp"]

    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            blk = q[f"stage{s}"][str(b)]
            cur = block_fn(
                blk, cur, cur_scale, cur_zp,
                kernel=3, stride=spec.block_stride(s, b),
                residual=spec.has_residual(s, b),
            )
            cur_scale, cur_zp = blk["out_scale"], blk["out_zp"]

    cur = _conv_q(cur, cur_zp, cur_scale, q["last"], 1, 0, relu6=True, requant=True)
    feats = jnp.mean(
        dequantize_affine_shifted(cur, q["last"]["out_scale"], q["last"]["out_zp"]),
        axis=(1, 2),
    )
    fc = q["fc"]
    f_q = quantize_affine_shifted(feats, fc["in_scale"], fc["in_zp"])
    acc = lax.dot_general(
        f_q, fc["w_q"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc = acc - (fc["in_zp"] - 128) * fc["w_sum"]
    return acc.astype(jnp.float32) * (fc["in_scale"] * fc["w_scale"]) + fc["bias"]
