"""Pallas TPU kernel: fused direct 3×3/stride-1 int8 convolution.

The workhorse of ResNet inference (≈84% of a ResNet18's MACs are 3×3 s1
convs). XLA's direct int8 conv lowering reaches ~180 TOPS on this chip while
its int8 matmul reaches ~5 POPS; this kernel expresses the conv as what the
MXU actually wants — nine shifted matmuls contracting the channel dim —
with the dequant+bias+relu+requant epilogue fused in VMEM:

    acc[p, o] = Σ_{dy,dx}  X[p shifted by (dy,dx), :] · W[dy,dx,:,o]

Halo handling: the caller pads the input (with the activation zero point)
and passes three row-shifted views x0/x1/x2 of height H; column shifts are
static in-VMEM slices. Grid order (n, cout-tile, row-tile) keeps the weight
block resident across the row sweep.

Same affine-int8 semantics as ops/int8_matmul.py (shifted-quint8
activations, per-channel symmetric weights, correction = zp_s·Σw).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _kernel(
    iscal_ref,  # SMEM (1,2) int32: [zp_s, out_zp]
    fscal_ref,  # SMEM (1,2) f32:   [in_scale, inv_out_scale]
    x0_ref, x1_ref, x2_ref,   # (1, TH, W+2, C) int8 row-shifted views
    w_ref,                    # (3, 3, C, TN) int8
    wscale_ref, bias_ref, wsum_ref,  # (1, TN)
    out_ref,                  # (1, TH, W, TN)
    *, W: int, relu: bool, requant: bool,
):
    xs = (x0_ref, x1_ref, x2_ref)
    acc = None
    for dy in range(3):
        x = xs[dy][0]  # (TH, W+2, C)
        for dx in range(3):
            part = lax.dot_general(
                x[:, dx : dx + W, :],
                w_ref[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (TH, W, TN)
            acc = part if acc is None else acc + part
    acc = acc - iscal_ref[0, 0] * wsum_ref[0]
    y = acc.astype(jnp.float32) * (fscal_ref[0, 0] * wscale_ref[0]) + bias_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    if requant:
        q = jnp.round(y * fscal_ref[0, 1]) + iscal_ref[0, 1].astype(jnp.float32)
        out_ref[0] = (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)
    else:
        out_ref[0] = y.astype(out_ref.dtype)


def conv3x3_s1_int8(
    x_s: jax.Array,        # (N, H, W, C) int8 shifted activations
    w_q: jax.Array,        # (3, 3, C, O) int8
    w_scale: jax.Array,    # (O,)
    bias: jax.Array,       # (O,)
    w_sum: jax.Array,      # (O,)
    *,
    in_scale,
    in_zp,
    relu: bool = False,
    out_scale=None,
    out_zp=None,
    interpret: bool = False,
) -> jax.Array:
    """Fused quantized 3×3 stride-1 same-pad conv → int8 or fp32 (N,H,W,O)."""
    n, h, w, c = x_s.shape
    kh, kw, c2, o = w_q.shape
    assert (kh, kw) == (3, 3) and c2 == c
    requant = out_scale is not None

    zp_s_val = jnp.asarray(in_zp, jnp.int32) - 128
    x_p = jnp.pad(
        x_s, ((0, 0), (1, 1), (1, 1), (0, 0)),
        constant_values=zp_s_val.astype(jnp.int8),
    )
    # three row-shifted full-width views, each (N, H, W+2, C)
    x0 = x_p[:, 0:h, :, :]
    x1 = x_p[:, 1 : h + 1, :, :]
    x2 = x_p[:, 2 : h + 2, :, :]

    # row-tile: keep TH*W in the hundreds of MXU rows
    th = max(1, min(h, 512 // max(w, 1)))
    while h % th:
        th -= 1
    tn = min(256, ((o + 127) // 128) * 128)
    grid = (n, _cdiv(o, tn), _cdiv(h, th))

    iscal = jnp.stack(
        [zp_s_val, jnp.asarray(out_zp if requant else 0, jnp.int32)]
    ).reshape(1, 2)
    inv_out = (
        1.0 / jnp.asarray(out_scale, jnp.float32) if requant else jnp.float32(1.0)
    )
    fscal = jnp.stack([jnp.asarray(in_scale, jnp.float32), inv_out]).reshape(1, 2)

    x_spec = lambda ni, ji, hi: (ni, hi, 0, 0)  # noqa: E731
    out_dtype = jnp.int8 if requant else jnp.float32
    kernel = functools.partial(_kernel, W=w, relu=relu, requant=requant)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda ni, ji, hi: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda ni, ji, hi: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, th, w + 2, c), x_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w + 2, c), x_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w + 2, c), x_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, tn), lambda ni, ji, hi: (0, 0, 0, ji), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, ji, hi: (0, ji), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, ji, hi: (0, ji), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, ji, hi: (0, ji), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, tn), lambda ni, ji, hi: (ni, hi, 0, ji), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, o), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * c * o,
            bytes_accessed=3 * n * h * (w + 2) * c + 9 * c * o + n * h * w * o,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        iscal, fscal, x0, x1, x2, w_q,
        w_scale.reshape(1, o).astype(jnp.float32),
        bias.reshape(1, o).astype(jnp.float32),
        w_sum.reshape(1, o).astype(jnp.int32),
    )
