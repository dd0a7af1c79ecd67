"""Channel-importance criteria.

Rebuilds the reference's importance menu (`pruning_engine_structured.py:18-32`:
MagnitudeImportance p=1/p=2, RandomImportance, GroupTaylorImportance; unknown
methods fall back to magnitude — here they raise instead), plus two
activation-based criteria the reference lacks (the direction of the retrieved
activation-pruning literature, PAPERS.md):

* ``bn_act`` — expected post-ReLU channel response. A BN'd channel's
  post-BN activation is ≈ N(bias, scale²) over the data distribution the
  running statistics were estimated on, so E[ReLU] has the closed form
  ``|scale|·(φ(z) + z·Φ(z))`` with ``z = bias/|scale|``. This is a
  *measured-activation* criterion (BN running stats are data statistics the
  framework already tracks) that costs zero extra forward passes — the
  TPU-idiomatic analog of averaging feature maps over a calibration set.
* ``apoz`` — Average Percentage of Zeros (Hu et al. 2016), same Gaussian
  model: importance = P(activation > 0) = Φ(z); channels that are almost
  always zero after ReLU score lowest.

Both are heuristics at sites where the nonlinearity is not plain ReLU
(EfficientNet's SiLU: E[SiLU] ≈ E[ReLU] away from z≈0) or where a residual
add sits between the BN and the ReLU; groups with no BN (EfficientNet SE
convs) fall back to weight-L2 for that layer.

For a coupled group with several producer convs, per-layer importance vectors
are normalized (mean-scaled, torch_pruning's default 'mean' group reduction)
and averaged so layers with different magnitudes contribute equally.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

from .graph import get_path

METHODS = ("l1", "l2", "random", "taylor", "group_norm", "bn_act", "apoz")

_erf = np.vectorize(math.erf)  # channel vectors are tiny; exactness > speed


def _gauss_relu_stats(scale: np.ndarray, bias: np.ndarray):
    """(E[ReLU(y)], P(y>0)) for y ~ N(bias, scale²) per channel."""
    s = np.abs(np.asarray(scale, dtype=np.float64)) + 1e-12
    mu = np.asarray(bias, dtype=np.float64)
    z = mu / s
    phi = np.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)  # standard normal pdf
    Phi = 0.5 * (1.0 + _erf(z / math.sqrt(2.0)))  # standard normal cdf
    return s * (phi + z * Phi), Phi


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

    if method in ("bn_act", "apoz"):
        per_layer = []
        for bn_path in group["bns"]:
            bn = get_path(params, bn_path)
            e_relu, p_nonzero = _gauss_relu_stats(bn["scale"], bn["bias"])
            v = e_relu if method == "bn_act" else p_nonzero
            per_layer.append(v / (v.mean() + 1e-12))
        if not per_layer:  # BN-less group (EfficientNet SE convs): weight L2
            for path, axis in group["producers"]:
                v = _norm(np.asarray(get_path(params, path)), axis, 2)
                per_layer.append(v / (v.mean() + 1e-12))
        return np.mean(per_layer, axis=0)

    p = 1 if method == "l1" else 2
    per_layer = []
    for path, axis in group["producers"]:
        w = np.asarray(get_path(params, path))
        v = _norm(w, axis, p)
        if method != "group_norm":
            v = v / (v.mean() + 1e-12)  # scale-normalize per layer
        per_layer.append(v)
    return np.mean(per_layer, axis=0)
