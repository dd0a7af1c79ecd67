"""Pallas TPU kernel: bf16 dense + exact-erf GELU in one pass.

XLA does not fuse the erf-GELU into a dot's epilogue: serving a ViT-S at
batch 256 pays a separate ~1.4 ms elementwise HBM round-trip per block for
`gelu(z @ w + b)` at the mlp1 shape (50432×384 @ 384×1384), where this
kernel runs the same computation in 0.82–0.99 ms isolated — the GELU
polynomial executes on the VPU while the MXU works on the next tile, and
the pre-activation tensor never touches HBM.

**Measured negative result (kept for the record; REPORT.md "Pallas
placement"):** wiring this into the folded bf16 ViT forward made the FULL
model ~5 ms SLOWER (45.6 vs 40.3 ms/b256) despite the isolated win — a
Mosaic custom call is a scheduling barrier to neighbouring XLA dots, and
alternating pallas↔XLA dots 12× pays more in lost overlap than the fusion
saves. Consecutive pallas calls don't pay it (a 12× pallas-only MLP stack
beats XLA 16.2 vs 35.1 ms), which is why the int8 executor uses its fused
kernels for the adjacent mlp1/mlp2 pair only (`compress/quant/qvit.py`).
`vit.apply(fused_mlp=True)` therefore stays opt-in and off by default.

erf is the Abramowitz & Stegun 7.1.26 polynomial (max abs err 5e-7 — below
bf16 resolution; Mosaic has no erf primitive). Forward-only: no custom VJP
is defined, so training paths must keep ``fused_mlp=False`` (the default).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int8_matmul import _erf


def _cdiv(a, b):
    return -(-a // b)


def use_fused_dense() -> bool:
    """Pallas on TPU; XLA composition elsewhere. IEVM_FUSED_DENSE=0|1
    overrides."""
    force = os.environ.get("IEVM_FUSED_DENSE")
    if force is not None:
        return force == "1"
    return jax.default_backend() == "tpu"


def _kernel(x_ref, w_ref, b_ref, out_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = acc + b_ref[:]
    y = y * 0.5 * (1.0 + _erf(y * (2.0**-0.5)))
    out_ref[:] = y.astype(out_ref.dtype)


# VMEM model for auto block sizing, calibrated on-chip: double-buffered
# x/w/out blocks plus ~8 bytes/element of output block for the fp32
# accumulator and epilogue temporaries. (bm=1024, bn=1384, K=384 measured
# 16.35 MB actual — over the 16 MB scoped limit; bm=1024, bn=768 fits and
# is the fastest measured mlp1 config, 0.82 ms vs 1.39 XLA.)
_VMEM_BUDGET = 14 * 2**20


def _pick_blocks(k: int, n: int, itemsize: int):
    for bm in (1024, 512, 256):
        for bn in (n, 1024, 768, 512, 256):
            if bn > n:
                continue
            need = 2 * itemsize * (bm * k + k * bn + bm * bn) + 8 * bm * bn
            if need <= _VMEM_BUDGET:
                return bm, bn
    return 256, 256


def dense_gelu(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """``gelu(x @ w + b, approximate=False)`` for (…, K) float ``x``.

    One fused kernel on TPU (fp32 accumulation, erf poly in the epilogue);
    plain XLA ops elsewhere. Output dtype = x.dtype.
    """
    if not use_fused_dense():
        return jax.nn.gelu((x @ w) + b, approximate=False)
    shape = x.shape
    k = shape[-1]
    n = w.shape[1]
    m = functools.reduce(lambda a, d: a * d, shape[:-1], 1)
    itemsize = jnp.dtype(x.dtype).itemsize
    bm, bn = _pick_blocks(k, n, itemsize)
    y = pl.pallas_call(
        _kernel,
        grid=(_cdiv(m, bm), _cdiv(n, bn)),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * (k + n) + k * n) * itemsize,
            transcendentals=m * n,
        ),
    )(x.reshape(-1, k), w, b.reshape(1, n))
    return y.reshape(*shape[:-1], n)
