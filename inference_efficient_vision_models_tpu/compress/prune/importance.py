"""Channel-importance criteria.

Rebuilds the reference's importance menu (`pruning_engine_structured.py:18-32`:
MagnitudeImportance p=1/p=2, RandomImportance, GroupTaylorImportance; unknown
methods fall back to magnitude — here they raise instead).

For a coupled group with several producer convs, per-layer importance vectors
are normalized (mean-scaled, torch_pruning's default 'mean' group reduction)
and averaged so layers with different magnitudes contribute equally.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .graph import get_path

METHODS = ("l1", "l2", "random", "taylor", "group_norm")


def _norm(w: np.ndarray, axis_keep: int, p: int) -> np.ndarray:
    """p-norm over all axes except ``axis_keep``."""
    w = np.moveaxis(np.asarray(w, dtype=np.float64), axis_keep, 0).reshape(w.shape[axis_keep], -1)
    if p == 1:
        return np.abs(w).sum(axis=1)
    return np.sqrt((w * w).sum(axis=1))


def channel_importance(
    group: Dict,
    params,
    method: str,
    *,
    rng: Optional[np.random.Generator] = None,
    grads=None,
) -> np.ndarray:
    """Importance score per channel of ``group`` (higher = keep)."""
    if method not in METHODS:
        raise ValueError(f"unknown pruning_method {method!r} (have {METHODS})")
    width = group["width"]

    if method == "random":
        assert rng is not None, "random importance needs an rng"
        return rng.random(width)

    if method == "taylor":
        # |w · ∂L/∂w| summed over the group's producer weights — first-order
        # Taylor expansion of loss change on channel removal.
        assert grads is not None, "taylor importance needs a grads pytree"
        score = np.zeros(width)
        for path, axis in group["producers"]:
            w = np.asarray(get_path(params, path))
            g = np.asarray(get_path(grads, path))
            contrib = np.abs(w * g)
            contrib = np.moveaxis(contrib, axis, 0).reshape(width, -1).sum(axis=1)
            score += contrib
        return score / max(len(group["producers"]), 1)

    p = 1 if method == "l1" else 2
    per_layer = []
    for path, axis in group["producers"]:
        w = np.asarray(get_path(params, path))
        v = _norm(w, axis, p)
        if method != "group_norm":
            v = v / (v.mean() + 1e-12)  # scale-normalize per layer
        per_layer.append(v)
    return np.mean(per_layer, axis=0)
