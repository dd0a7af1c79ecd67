"""Depthwise int8 convolution as k² shifted integer multiply-adds.

A depthwise conv is NOT a matmul — there is no contraction over channels —
so lowering it through the conv/MXU path (``lax.conv_general_dilated`` with
``feature_group_count == C``) is the wrong shape for the hardware: on TPU it
wastes the systolic array on a VPU-shaped op, and XLA:CPU's int8 grouped
conv emulation is catastrophically slow (~67 s for one EfficientNet-B0
forward at batch 8, 64×64 — measured; it dominates CI time).

The natural lowering is elementwise: for a k×k kernel,

    y[n, i, j, c] = Σ_{dy, dx} x[n, i·s + dy, j·s + dx, c] · w[dy, dx, c]

i.e. k² strided slices of the (pre-padded) input, each multiplied by one
broadcast kernel tap and accumulated in int32 — pure VPU work that XLA
fuses into a single pass over the output. Integer arithmetic is exact, so
this is bit-identical to the grouped-conv formulation (asserted in
tests/test_ops.py).

Measured (batch 256, pruned EfficientNet-B0 end-to-end): the shift lowering
is ~950× faster on XLA:CPU (66.7 s → 0.07 s per batch-8 call), but on the
TPU the native int8 grouped-conv lowering wins 2.25× (20.7 vs 46.7 ms per
batch — strided sub-lane slices at 112² spatial relayout poorly), so
``prefer_shift_lowering()`` picks per backend.

Replaces the reference's QNNPACK depthwise kernels
(`quantization/main.py:187-188` sets the qnnpack engine whose int8
depthwise convs back torchvision MobileNet/EfficientNet blocks).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["depthwise_conv_int8", "prefer_shift_lowering"]


def prefer_shift_lowering() -> bool:
    """True when the elementwise shift lowering should replace the grouped
    conv (every backend except TPU; override with IEVM_DW_INT8=shift|conv)."""
    force = os.environ.get("IEVM_DW_INT8")
    if force:
        return force == "shift"
    return jax.default_backend() != "tpu"


def depthwise_conv_int8(x_s8, w_q, stride: int = 1) -> jnp.ndarray:
    """int8 depthwise conv → int32 accumulator.

    Args:
      x_s8: (N, Hp, Wp, C) int8 input, ALREADY padded (zero-point padding is
        the caller's contract, as in the grouped-conv path).
      w_q: (k, k, 1, C) int8 depthwise kernel (HWIO with I==1).
      stride: spatial stride.

    Returns (N, Ho, Wo, C) int32 with Ho = (Hp - k)//stride + 1.
    """
    n, hp, wp, c = x_s8.shape
    k = w_q.shape[0]
    ho = (hp - k) // stride + 1
    wo = (wp - k) // stride + 1
    w32 = jnp.asarray(w_q).astype(jnp.int32)
    acc = None
    for dy in range(k):
        for dx in range(k):
            sl = x_s8[
                :,
                dy : dy + (ho - 1) * stride + 1 : stride,
                dx : dx + (wo - 1) * stride + 1 : stride,
                :,
            ].astype(jnp.int32)
            term = sl * w32[dy, dx, 0]
            acc = term if acc is None else acc + term
    return acc
