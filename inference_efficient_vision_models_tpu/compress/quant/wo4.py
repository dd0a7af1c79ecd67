"""Weight-only INT4 (W4A16): packed int4 weights, group-wise scales, bf16 compute.

Extends the W8A16 mode (`wo8.py`) one step further down the weight-compression
curve — a capability the reference has no analog for (its smallest artifact is
static int8, 3.95x, `/root/reference/README.md:62`). Storage:

    q4     int8 array with TWO int4 values per byte, packed along the
           output-channel axis (all models keep even channel counts; the
           pruner's ``round_to`` guarantees it) -> (..., out/2)
    s      fp32 scales of shape (G, out): per output channel AND per group of
           the flattened reduction axis. G is chosen as r/g for the largest
           divisor g of r with g <= 64 (r = prod(leading dims)), so the whole
           layout is reconstructible from array shapes alone -- no metadata
           in the pytree, which keeps every leaf a plain array (msgpack
           round-trips, jit-traceable).

Serving dequantizes to bf16 inside the jit exactly like W8A16 -- XLA fuses the
unpack (two arithmetic shifts) + scale multiply into the consuming conv, so
throughput matches bf16 while weights shrink ~7.4x vs fp32 (int4 + 6% scale
overhead at g=64). Rare weights that can't pack (odd out-channels) fall back
to the W8A16 per-channel int8 leaf inside the same artifact.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .observers import quantize_weight_per_channel
from .wo8 import _is_qleaf as _is_q8leaf

__all__ = [
    "convert_weight_only_int4",
    "dequantize",
    "is_weight_only_int4",
    "quantize_weight_int4",
]

_MAX_GROUP = 64


def _pick_group(r: int) -> int:
    """Largest divisor of ``r`` that is <= _MAX_GROUP (>=1 always exists)."""
    for g in range(min(r, _MAX_GROUP), 0, -1):
        if r % g == 0:
            return g
    return 1


def _is_q4leaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q4", "s"}


def _is_anyleaf(x) -> bool:
    return _is_q4leaf(x) or _is_q8leaf(x)


def quantize_weight_int4(w: np.ndarray) -> Dict[str, np.ndarray]:
    """(..., out) fp32 -> {"q4": (..., out/2) int8 packed, "s": (G, out) fp32}.

    Symmetric int4 in [-7, 7]; scales are max|w|/7 per (reduction-group,
    output-channel). ``out`` must be even (checked by the caller).
    """
    w = np.asarray(w, np.float32)
    out = w.shape[-1]
    r = int(np.prod(w.shape[:-1]))
    g = _pick_group(r)
    wg = w.reshape(r // g, g, out)
    s = np.maximum(np.abs(wg).max(axis=1) / 7.0, 1e-12).astype(np.float32)
    q = np.clip(np.rint(wg / s[:, None, :]), -7, 7).astype(np.int8)
    q = q.reshape(*w.shape[:-1], out)
    lo, hi = q[..., 0::2], q[..., 1::2]
    packed = ((lo & np.int8(0x0F)) | (hi << np.int8(4))).astype(np.int8)
    return {"q4": packed, "s": s}


def _unpack_scale(x, dtype):
    """Jittable inverse of quantize_weight_int4 (shapes fully static)."""
    p = jnp.asarray(x["q4"])  # (..., out/2) int8, two nibbles per byte
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)  # sign-extend low nibble
    hi = jnp.right_shift(p, 4)  # arithmetic shift sign-extends
    q = jnp.stack([lo, hi], axis=-1).reshape(*p.shape[:-1], p.shape[-1] * 2)
    s = jnp.asarray(x["s"])  # (G, out)
    out = q.shape[-1]
    r = int(np.prod(q.shape[:-1]))
    wf = q.reshape(s.shape[0], r // s.shape[0], out).astype(jnp.float32)
    wf = wf * s[:, None, :]
    return wf.reshape(*q.shape).astype(dtype)


def _keep_int8_auto(path, a) -> bool:
    """Default int8-fallback policy: int4 only where the bytes are.

    Depthwise kernels (HWIO with I/groups == 1 — 9 taps per channel, no
    cross-channel mixing to average quantization error) and tiny-reduction
    kernels (stems: r = k*k*3 = 27) carry <2% of a MBConv model's weight
    bytes but are exactly where naive int4 collapses accuracy (ef2 measured
    −22 pts with int4-everything vs −0.5 for W8A16). Keeping them int8
    costs ~nothing in size and rescues the mode."""
    return (a.ndim == 4 and a.shape[2] == 1) or int(np.prod(a.shape[:-1])) < 32


def convert_weight_only_int4(folded, *, keep_int8=_keep_int8_auto) -> Dict[str, Any]:
    """Folded fp32 model -> same-structure tree with packed-int4 ``"w"``
    leaves ({"q4","s"}); odd-out-channel weights and leaves selected by
    ``keep_int8(path, arr)`` keep the W8A16 per-channel int8 leaf
    ({"q","s"}). Mirrors wo8.convert_weight_only's walk.

    ``keep_int8``: policy predicate (key-path tuple, np.ndarray) -> bool;
    pass ``lambda p, a: False`` for int4-everything (the A/B baseline)."""

    def _int8_leaf(a):
        w_q, scale = quantize_weight_per_channel(a, channel_axis=a.ndim - 1)
        return {"q": w_q, "s": scale}

    def walk(node, path=()):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                a = np.asarray(v) if not isinstance(v, dict) else None
                if (
                    k == "w"
                    and a is not None
                    and a.ndim >= 2
                    and a.dtype == np.float32
                ):
                    if a.shape[-1] % 2 != 0 or (
                        keep_int8 is not None and keep_int8(path + (k,), a)
                    ):
                        out[k] = _int8_leaf(a)
                    else:
                        out[k] = quantize_weight_int4(a)
                else:
                    out[k] = walk(v, path + (k,))
            return out
        return np.asarray(node)

    return walk(jax.device_get(folded))


def dequantize(model, dtype=jnp.bfloat16):
    """Reconstruct a folded-model pytree in ``dtype`` (jittable; XLA fuses
    the nibble unpack + dequant into the consuming conv/matmul)."""

    def d(x):
        if _is_q4leaf(x):
            return _unpack_scale(x, dtype)
        if _is_q8leaf(x):
            return (jnp.asarray(x["q"]).astype(jnp.float32) * jnp.asarray(x["s"])).astype(dtype)
        x = jnp.asarray(x)
        return x.astype(dtype) if x.dtype == jnp.float32 else x

    return jax.tree.map(d, model, is_leaf=_is_anyleaf)


def is_weight_only_int4(model) -> bool:
    """Detect a W4A16 artifact by its {"q4","s"} weight leaves."""
    found = False

    def visit(x):
        nonlocal found
        found = found or _is_q4leaf(x)
        return x

    jax.tree.map(visit, model, is_leaf=_is_anyleaf)
    return found
