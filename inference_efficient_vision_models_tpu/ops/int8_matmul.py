"""Pallas TPU kernel: int8×int8→int32 matmul with fused requant epilogue.

The native-equivalent of the reference's QNNPACK int8 kernels
(`quantization/main.py:187-188` selects the qnnpack engine; SURVEY.md §2.2
names "Pallas int8 conv/matmul on the MXU with per-channel scales" as the
headline native work item). One kernel does:

    acc   = X_s · W_q            (MXU, int8 × int8 → int32)
    acc  -= zp_s · Σ_k W_q[k,n]  (affine-input correction, per column)
    y     = acc · (s_x · s_w[n]) + bias[n]       (VPU fp32 epilogue)
    y     = relu(y)                              (optional)
    out   = clip(round(y / s_y) + zp_y) − 128    (optional requant → int8)

Per-tensor quantization scalars arrive through SMEM so they may be traced
pytree leaves (the converted model is one msgpack-serializable pytree);
per-channel vectors stream through VMEM blocks. Tiles: M×N grid with
full-K blocks (ResNet K ≤ 4608 int8 → ≤ 4.5 KB per activation row).
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


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _erf(x):
    """Abramowitz & Stegun 7.1.26 erf (max abs err 1.5e-7 — below bf16
    resolution). Mosaic has no erf primitive; this uses only exp/FMA."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _kernel(
    iscal_ref,  # SMEM (1,2) int32:  [zp_s, out_zp]
    fscal_ref,  # SMEM (1,2) f32:    [in_scale, inv_out_scale]
    x_ref, w_ref, wscale_ref, bias_ref, wsum_ref, out_ref,
    *, act, requant: bool, quantize_input: bool,
):
    if quantize_input:
        # fused quantize_affine_shifted: float tile → shifted int8 in VMEM.
        # One HBM read of the float activations replaces XLA's separate
        # quantize pass (read float + write int8 + re-read int8): the int8
        # intermediate never exists in HBM.
        q = jnp.round(x_ref[:].astype(jnp.float32) / fscal_ref[0, 0])
        q = q + (iscal_ref[0, 0] + 128).astype(jnp.float32)
        x_s = (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)
    else:
        x_s = x_ref[:]
    acc = jnp.dot(x_s, w_ref[:], preferred_element_type=jnp.int32)
    acc = acc - iscal_ref[0, 0] * wsum_ref[:]
    y = acc.astype(jnp.float32) * (fscal_ref[0, 0] * wscale_ref[:]) + bias_ref[:]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "gelu":
        # erf-GELU in the epilogue: the VPU polynomial runs while the MXU
        # works on the next tile — a separate XLA gelu pass costs a full
        # HBM round-trip of the activation tensor (~1.5 ms at ViT-S b256
        # mlp1 shapes; scripts/vit_pallas_tune.py).
        y = y * 0.5 * (1.0 + _erf(y * (2.0**-0.5)))
    elif act == "gelu_tanh":
        y = jax.nn.gelu(y, approximate=True)
    if requant:
        q = jnp.round(y * fscal_ref[0, 1]) + iscal_ref[0, 1].astype(jnp.float32)
        out_ref[:] = (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)
    else:
        out_ref[:] = y.astype(out_ref.dtype)


def int8_matmul_requant(
    x_s: jax.Array,          # (M, K) int8, shifted-quint8 activations
    w_q: jax.Array,          # (K, N) int8, per-column symmetric weights
    w_scale: jax.Array,      # (N,)  f32
    bias: jax.Array,         # (N,)  f32
    w_sum: jax.Array,        # (N,)  i32  (Σ_k w_q)
    *,
    in_scale,
    in_zp,                   # unshifted quint8 zero point [0, 255]
    relu: bool = False,
    act=None,                # None | 'relu' | 'gelu' | 'gelu_tanh' (epilogue)
    out_scale=None,          # None → float output (out_dtype)
    out_zp=None,
    out_dtype=jnp.float32,   # float output dtype when not requantizing
    block_m: int = 512,
    block_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused quantized dense layer. Returns int8 (requantized) or float.

    Scalar qparams may be Python numbers or traced 0-d arrays. When ``x_s``
    is a float array (fp32/bf16) the kernel quantizes it per tile in VMEM
    (``quantize_affine_shifted`` semantics) before the int8 MXU dot — the
    serving fast path for float activation carriers.
    """
    M, K = x_s.shape
    K2, N = w_q.shape
    assert K == K2, (K, K2)
    quantize_input = jnp.issubdtype(x_s.dtype, jnp.floating)
    if relu:
        act = "relu"
    requant = out_scale is not None
    block_m = min(block_m, _round_up(M, 32))
    block_n = min(block_n, _round_up(N, 128))

    zp_s = jnp.asarray(in_zp, jnp.int32) - 128
    iscal = jnp.stack(
        [zp_s, jnp.asarray(out_zp if requant else 0, jnp.int32)]
    ).reshape(1, 2)
    inv_out = (
        1.0 / jnp.asarray(out_scale, jnp.float32)
        if requant
        else jnp.float32(1.0)
    )
    fscal = jnp.stack(
        [jnp.asarray(in_scale, jnp.float32), inv_out]
    ).reshape(1, 2)

    out_dtype = jnp.int8 if requant else out_dtype
    x_bytes = 2 if x_s.dtype == jnp.bfloat16 else (4 if quantize_input else 1)
    o_bytes = 1 if requant else jnp.dtype(out_dtype).itemsize
    grid = (_cdiv(M, block_m), _cdiv(N, block_n))
    return pl.pallas_call(
        functools.partial(
            _kernel, act=act, requant=requant, quantize_input=quantize_input
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * x_bytes + K * N + M * N * o_bytes,
            transcendentals=M * N if act in ("gelu", "gelu_tanh") else 0,
        ),
        interpret=interpret,
    )(
        iscal,
        fscal,
        x_s,
        w_q,
        w_scale.reshape(1, N).astype(jnp.float32),
        bias.reshape(1, N).astype(jnp.float32),
        w_sum.reshape(1, N).astype(jnp.int32),
    )
