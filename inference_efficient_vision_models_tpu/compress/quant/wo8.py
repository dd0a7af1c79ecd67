"""Weight-only INT8 (W8A16): int8 per-channel weight storage, bf16 compute.

A TPU-native serving mode the reference has no analog for — its int8 story
is QNNPACK CPU kernels (`quantization/main.py:187-242`) where activations
must be quantized too. On TPU, MBConv families (MobileNetV2/EfficientNet)
are VPU/bandwidth-bound at small channel counts, so full activation
quantization *loses* to bf16 end-to-end (measured: pruned EfficientNet-B0
batch-256 int8 20.7 ms vs bf16 11.9 ms) while weight-only quantization keeps
bf16 throughput AND the ~3.9× on-disk/HBM weight compression:

    store   w_q int8 + per-output-channel scale      (3.9× smaller)
    serve   dequantize to bf16 inside the jit (one cheap pass over the
            weights, fused by XLA) → the standard folded bf16 forward

Works for every family: every ``"w"``-keyed kernel in the folded model
(HWIO convs, (in, out) dense — all output-channel-LAST) quantizes on its
last axis; biases, vectors, and non-matmul parameters (ViT cls token /
position embeddings) stay fp32.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .observers import quantize_weight_per_channel

__all__ = ["convert_weight_only", "dequantize", "is_weight_only"]


def _is_qleaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q", "s"}


def convert_weight_only(folded) -> Dict[str, Any]:
    """Folded fp32 model → same-structure tree with int8 ``"w"`` leaves."""

    def walk(node):
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
                    w_q, scale = quantize_weight_per_channel(a, channel_axis=a.ndim - 1)
                    out[k] = {"q": w_q, "s": scale}
                else:
                    out[k] = walk(v)
            return out
        return np.asarray(node)

    return walk(jax.device_get(folded))


def dequantize(model, dtype=jnp.bfloat16):
    """Reconstruct a folded-model pytree in ``dtype`` (jittable; XLA fuses
    the per-weight dequant into the consuming conv/matmul)."""

    def d(x):
        if _is_qleaf(x):
            # scale application stays fp32 (XLA fuses the cast into the
            # consuming matmul); bf16 scales cost ~0.4% extra weight error
            return (x["q"].astype(jnp.float32) * x["s"]).astype(dtype)
        x = jnp.asarray(x)
        return x.astype(dtype) if x.dtype == jnp.float32 else x

    return jax.tree.map(d, model, is_leaf=_is_qleaf)


def is_weight_only(model) -> bool:
    """Detect a weight-only artifact by its {"q","s"} weight leaves."""
    found = False

    def visit(x):
        nonlocal found
        found = found or _is_qleaf(x)
        return x

    jax.tree.map(visit, model, is_leaf=_is_qleaf)
    return found
