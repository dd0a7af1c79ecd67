"""Quantization observers as jittable reductions.

Reproduces the semantics the reference configures for FX graph-mode static
INT8 (`quantization/main.py:198-222`):

* weights — ``PerChannelMinMaxObserver(ch_axis=0, dtype=qint8,
  qscheme=per_channel_symmetric)``: scale = max(−min, max) / 127.5, zp = 0.
* activations — ``MovingAverageMinMaxObserver(averaging_constant=0.01,
  dtype=quint8, qscheme=affine)``: EMA min/max; scale = (max−min)/255,
  zp = −round(min/scale) clamped to [0, 255]; ranges always include 0.

Numerics are validated against torch.ao.quantization observers in
tests/test_quant.py.

Activation storage on TPU: quint8 values are stored shifted by −128 as int8
(``q_s = q − 128``, ``zp_s = zp − 128``) so conv/matmul run in the MXU's
native int8×int8→int32 mode; the affine math is unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

EPS = 1.1920928955078125e-07  # torch.finfo(float32).eps


class ObserverState(NamedTuple):
    """EMA min/max per tap. ``initialized`` switches first-batch semantics
    (torch initializes to the first batch's stats, then EMAs)."""

    min: float
    max: float
    initialized: bool

    @staticmethod
    def fresh() -> "ObserverState":
        return ObserverState(min=0.0, max=0.0, initialized=False)

    def update(self, batch_min: float, batch_max: float, c: float = 0.01) -> "ObserverState":
        if not self.initialized:
            return ObserverState(float(batch_min), float(batch_max), True)
        return ObserverState(
            self.min + c * (float(batch_min) - self.min),
            self.max + c * (float(batch_max) - self.max),
            True,
        )


def minmax_qparams_affine(min_val: float, max_val: float) -> Tuple[float, int]:
    """quint8 affine qparams from a range (torch MinMax semantics)."""
    min_val = min(float(min_val), 0.0)
    max_val = max(float(max_val), 0.0)
    scale = (max_val - min_val) / 255.0
    scale = max(scale, EPS)
    zp = 0 - round(min_val / scale)
    zp = int(np.clip(zp, 0, 255))
    return scale, zp


def minmax_qparams_symmetric_per_channel(w: np.ndarray, channel_axis: int) -> np.ndarray:
    """qint8 symmetric per-channel scales (zero_point = 0)."""
    w = np.asarray(w, dtype=np.float32)
    moved = np.moveaxis(w, channel_axis, 0).reshape(w.shape[channel_axis], -1)
    min_val = np.minimum(moved.min(axis=1), 0.0)
    max_val = np.maximum(moved.max(axis=1), 0.0)
    amax = np.maximum(-min_val, max_val)
    scale = amax / 127.5
    return np.maximum(scale, EPS).astype(np.float32)


def quantize_weight_per_channel(w: np.ndarray, channel_axis: int):
    """→ (w_q int8, scale f32[channels]). Round-half-to-even like torch."""
    scale = minmax_qparams_symmetric_per_channel(w, channel_axis)
    shape = [1] * w.ndim
    shape[channel_axis] = -1
    q = np.round(np.asarray(w, np.float32) / scale.reshape(shape))
    return np.clip(q, -128, 127).astype(np.int8), scale


def quantize_affine_shifted(x, scale: float, zp: int):
    """fp32 → shifted-int8 storage of quint8 affine values (jittable)."""
    q = jnp.round(x.astype(jnp.float32) / scale) + zp
    return (jnp.clip(q, 0, 255) - 128).astype(jnp.int8)


def dequantize_affine_shifted(q_s, scale: float, zp: int):
    return (q_s.astype(jnp.float32) - (zp - 128)) * scale


def batch_min_max(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x = x.astype(jnp.float32)
    return jnp.min(x), jnp.max(x)
