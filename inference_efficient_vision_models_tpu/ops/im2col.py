"""int8 convolution as im2col + MXU matmul.

Measured on this chip: XLA's direct int8 conv lowering reaches ~180 TOPS
while a plain int8 matmul reaches ~5 POPS — a ~30× gap. Lowering the conv to
patches + one big matmul trades 9× activation reads (int8, cheap) for MXU
peak, and feeds the fused Pallas requant kernel (ops/int8_matmul.py) so the
epilogue costs no extra HBM round-trip.

Patch extraction is pure XLA data movement (static slices of the padded
input, concatenated along channels) — fused into surrounding ops, no
gather/scatter.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .int8_matmul import int8_matmul_requant


def _extract_patches_nhwc(x, kh: int, kw: int, stride: int, padding: int, pad_value):
    """(N,H,W,C) → (N, Ho, Wo, kh*kw*C), torch-style symmetric padding."""
    n, h, w, c = x.shape
    if padding:
        x = jnp.pad(
            x,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            constant_values=pad_value,
        )
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            sl = x[:, dy : dy + (ho - 1) * stride + 1 : stride,
                     dx : dx + (wo - 1) * stride + 1 : stride, :]
            cols.append(sl)
    return jnp.concatenate(cols, axis=-1), ho, wo


def conv_int8_im2col(
    x_s: jax.Array,        # (N,H,W,C) int8 shifted activations
    w_q: jax.Array,        # (kh,kw,C,O) int8
    w_scale: jax.Array,    # (O,)
    bias: jax.Array,       # (O,)
    w_sum: jax.Array,      # (O,) Σ over (kh,kw,C)
    *,
    stride: int,
    padding: int,
    in_scale: float,
    in_zp: int,
    relu: bool = False,
    out_scale: Optional[float] = None,
    out_zp: Optional[int] = None,
    interpret: bool = False,
    backend: str = "pallas",
) -> jax.Array:
    """Quantized conv via patches + int8 matmul.

    Padding uses the shifted zero point so the affine correction stays the
    per-channel constant ``zp_s·Σw`` (see compress/quant/qresnet.py).
    ``backend="pallas"`` runs the fused Pallas matmul kernel;
    ``backend="xla"`` runs an XLA dot with the same epilogue (XLA fuses it) —
    the better choice for small-spatial layers where XLA's direct conv
    lowering degrades. Returns (N,Ho,Wo,O) int8 (requantized) or fp32.
    """
    kh, kw, c, o = w_q.shape
    n = x_s.shape[0]
    zp_s = (jnp.asarray(in_zp, jnp.int32) - 128).astype(jnp.int8)
    patches, ho, wo = _extract_patches_nhwc(x_s, kh, kw, stride, padding, zp_s)
    m = n * ho * wo
    pm = patches.reshape(m, kh * kw * c)
    wm = w_q.reshape(kh * kw * c, o)
    if backend == "xla":
        acc = jax.lax.dot_general(
            pm, wm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc = acc - (jnp.asarray(in_zp, jnp.int32) - 128) * w_sum
        y = acc.astype(jnp.float32) * (
            jnp.asarray(in_scale, jnp.float32) * w_scale
        ) + bias
        if relu:
            y = jax.nn.relu(y)
        if out_scale is not None:
            q = jnp.round(y / out_scale) + out_zp
            out = (jnp.clip(q, 0, 255) - 128).astype(jnp.int8)
        else:
            out = y
    else:
        out = int8_matmul_requant(
            pm, wm, w_scale, bias, w_sum,
            in_scale=in_scale, in_zp=in_zp, relu=relu,
            out_scale=out_scale, out_zp=out_zp, interpret=interpret,
        )
    return out.reshape(n, ho, wo, o)
