"""Whole-block fused int8 MBConv forward (EfficientNet + MobileNetV2).

Packs each converted static-int8 MBConv block (qeffnet/qmobilenet pytrees)
into the operand layout of ``ops.fused_mbconv`` — requant scalars in one SMEM
row, zp·Σw corrections folded into bias vectors, depthwise weights as exact
f32 integers — and runs the network with ONE Pallas kernel per block instead
of the unfused expand/dw/SE/project op chain. Stem, head, and classifier
reuse the family modules' ops unchanged, so logits match ``apply_int8`` up
to f32 reduction-order rounding (asserted ±1 quantum per block output in
tests/test_fused_mbconv.py).

Pack once (host-side), serve many: ``pack_fused`` is NOT traced — call it
outside jit and close over the result, exactly like the qmodel itself.

This is the bandwidth experiment VERDICT r2 §6 asked for: the expanded
hidden tensor never touches HBM (compare REPORT.md §int8 roofline).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ...models.efficientnet import EfficientNetSpec
from ...models.mobilenet import MobileNetV2Spec
from ...ops.fused_mbconv import fusable, fused_mbconv_block
from . import qeffnet, qmobilenet
from .observers import dequantize_affine_shifted, quantize_affine_shifted

__all__ = ["pack_fused", "apply_int8_fused"]


def _scal_row(
    in_scale, in_zp, e, d_scale, d_zp, q_scale, q_zp, o_scale, o_zp
) -> np.ndarray:
    row = np.zeros((1, 12), np.float32)
    row[0, 0] = float(in_zp) - 128.0
    if e is not None:
        row[0, 1] = 1.0 / float(e[0])
        row[0, 2] = float(e[1])
    row[0, 3] = 1.0 / float(d_scale)
    row[0, 4] = float(d_zp)
    row[0, 5] = float(d_scale)
    row[0, 6] = 1.0 / float(q_scale)
    row[0, 7] = float(q_zp)
    row[0, 8] = 1.0 / float(o_scale)
    row[0, 9] = float(o_zp)
    row[0, 10] = float(in_scale)          # residual dequant
    row[0, 11] = float(in_zp) - 128.0
    return row


def _pack_block(blk: Dict, in_scale, in_zp, *, se: bool) -> Dict:
    out: Dict = {}
    if "expand" in blk:
        e = blk["expand"]
        eff = np.float32(in_scale) * np.asarray(e["w_scale"], np.float32)
        out["we"] = np.asarray(e["w_q"]).reshape(e["w_q"].shape[-2], e["w_q"].shape[-1])
        out["ve"] = np.stack([
            eff,
            np.asarray(e["bias"], np.float32)
            - (float(in_zp) - 128.0) * np.asarray(e["w_sum"], np.float32) * eff,
        ])
        dw_in_scale = float(e["out_scale"])
        e_pair = (e["out_scale"], e["out_zp"])
    else:
        dw_in_scale = float(in_scale)
        e_pair = None

    d = blk["dw"]
    kk = d["w_q"].shape[0] * d["w_q"].shape[1]
    out["wdw"] = np.asarray(d["w_q"], np.float32).reshape(kk, d["w_q"].shape[-1])
    out["vdw"] = np.stack([
        dw_in_scale * np.asarray(d["w_scale"], np.float32),
        np.asarray(d["bias"], np.float32),
    ])

    if se:
        out["srw"] = np.asarray(qeffnet._deq_se(blk["se_reduce"]), np.float32)
        out["srb"] = np.asarray(blk["se_reduce"]["b"], np.float32).reshape(1, -1)
        out["sew"] = np.asarray(qeffnet._deq_se(blk["se_expand"]), np.float32)
        out["seb"] = np.asarray(blk["se_expand"]["b"], np.float32).reshape(1, -1)
        q_scale, q_zp = float(blk["se_scale"]), float(blk["se_zp"])
    else:
        q_scale, q_zp = float(d["out_scale"]), float(d["out_zp"])

    p = blk["project"]
    effp = np.float32(q_scale) * np.asarray(p["w_scale"], np.float32)
    out["wp"] = np.asarray(p["w_q"]).reshape(p["w_q"].shape[-2], p["w_q"].shape[-1])
    out["vp"] = np.stack([
        effp,
        np.asarray(p["bias"], np.float32)
        - (q_zp - 128.0) * np.asarray(p["w_sum"], np.float32) * effp,
    ])
    out["scal"] = _scal_row(
        in_scale, in_zp, e_pair,
        d["out_scale"], d["out_zp"], q_scale, q_zp,
        blk["out_scale"], blk["out_zp"],
    )
    return out


def pack_fused(spec, q: Dict) -> Dict:
    """Per-block fused-kernel operands for a converted static-int8 model."""
    se = isinstance(spec, EfficientNetSpec)
    qf: Dict = {}
    cur_scale, cur_zp = float(q["stem"]["out_scale"]), float(q["stem"]["out_zp"])
    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            blk = q[f"stage{s}"][str(b)]
            qf[f"s{s}b{b}"] = _pack_block(blk, cur_scale, cur_zp, se=se)
            cur_scale, cur_zp = blk["out_scale"], blk["out_zp"]
    return qf


def apply_int8_fused(spec, q: Dict, qf: Dict, x, *, interpret: bool = False):
    """Static-int8 forward with one fused Pallas kernel per MBConv block.

    Same I/O contract as the family ``apply_int8`` (raw uint8 NHWC input for
    fold_input models). ``qf`` comes from :func:`pack_fused`.
    """
    if isinstance(spec, EfficientNetSpec):
        fam, act = qeffnet, "silu"
    elif isinstance(spec, MobileNetV2Spec):
        fam, act = qmobilenet, "relu6"
    else:
        raise TypeError(f"fused path supports MBConv families, got {type(spec)}")

    stem = q["stem"]
    if "e" in stem:
        from . import stemfold

        if fam is qeffnet:
            y = stemfold.apply_u8_stem(stem, x, stride=2, pad=1, act="silu")
        else:
            y = stemfold.apply_u8_stem(stem, x, stride=2, pad=1, relu6=True)
        cur = fam._requant(y, stem["out_scale"], stem["out_zp"])
    else:
        in_scale, in_zp = q["input"]["scale"], q["input"]["zp"]
        x_s = quantize_affine_shifted(x, in_scale, in_zp)
        if fam is qeffnet:
            cur = fam._conv_q(x_s, in_zp, in_scale, stem, 2, 1, act=True, requant=True)
        else:
            cur = fam._conv_q(x_s, in_zp, in_scale, stem, 2, 1, relu6=True, requant=True)

    cur_scale, cur_zp = stem["out_scale"], stem["out_zp"]
    for s, depth in enumerate(spec.depths):
        k = spec.stage_kernels[s] if hasattr(spec, "stage_kernels") else 3
        for b in range(depth):
            stride = spec.block_stride(s, b)
            blk = q[f"stage{s}"][str(b)]
            ce = int(qf[f"s{s}b{b}"]["wdw"].shape[-1])
            if interpret or fusable(int(cur.shape[1]), ce, stride):
                res = cur if spec.has_residual(s, b) else None
                cur = fused_mbconv_block(
                    cur, qf[f"s{s}b{b}"], kernel=k, stride=stride, act=act,
                    x_res=res, interpret=interpret,
                )
            else:
                # Outside the measured Mosaic envelope (see
                # ops.fused_mbconv.fusable: stride-2 downsampling, unaligned
                # spatial extents, >1-lane-tile expanded channels) the block
                # runs the unfused op chain. The fused win is concentrated
                # in the in-envelope blocks anyway: they hold the largest
                # expanded tensors that otherwise round-trip HBM.
                cur = fam.block_int8(
                    blk, cur, cur_scale, cur_zp,
                    kernel=k, stride=stride, residual=spec.has_residual(s, b),
                )
            cur_scale, cur_zp = blk["out_scale"], blk["out_zp"]

    last = q["last"]
    if fam is qeffnet:
        cur_scale, cur_zp = _last_in_domain(spec, q)
        cur = fam._conv_q(cur, cur_zp, cur_scale, last, 1, 0, act=True, requant=True)
    else:
        cur_scale, cur_zp = _last_in_domain(spec, q)
        cur = fam._conv_q(cur, cur_zp, cur_scale, last, 1, 0, relu6=True, requant=True)
    feats = jnp.mean(
        dequantize_affine_shifted(cur, last["out_scale"], last["out_zp"]), axis=(1, 2)
    )
    fc = q["fc"]
    f_q = quantize_affine_shifted(feats, fc["in_scale"], fc["in_zp"])
    from jax import lax

    acc = lax.dot_general(
        f_q, fc["w_q"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc = acc - (fc["in_zp"] - 128) * fc["w_sum"]
    return acc.astype(jnp.float32) * (fc["in_scale"] * fc["w_scale"]) + fc["bias"]


def _last_in_domain(spec, q):
    s = len(spec.depths) - 1
    b = spec.depths[s] - 1
    blk = q[f"stage{s}"][str(b)]
    return blk["out_scale"], blk["out_zp"]
