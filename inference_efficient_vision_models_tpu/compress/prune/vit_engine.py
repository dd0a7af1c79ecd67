"""Structured pruning for Vision Transformers: MLP channels + whole heads.

The reference names ViT backbones in its configs
(`knowledge_distillation/kd_config.py:13-14`) but its torch_pruning-based
engine only ever ran on CNNs. Here ViTs get first-class structured pruning
with transformer-appropriate groups:

* **MLP hidden channels** — free group per block: mlp1 output columns,
  mlp1 bias, mlp2 input rows.
* **Attention heads** — whole-head granularity per block: a head owns an
  ``hd``-sized column slice in EACH of the q/k/v segments of the fused qkv
  kernel (layout ``(d, 3·H·hd)`` with the 3-axis outermost) plus the matching
  proj input rows. Importance is the L1/L2 norm over the head's qkv+proj
  parameters.
* **Embedding dim is structurally excluded**: the residual stream couples
  every block, the patch embed, position embeddings, and LayerNorms into one
  global group; pruning it buys little (the reference's head-protection
  analog) and is documented as out of scope — heads and MLP carry ~2/3 of
  ViT parameters.

Channel selection mirrors the CNN engine: per-group magnitude ranking,
``ratio`` fraction removed, ``round_to`` alignment for the MLP groups (heads
are already hd=64-aligned, MXU-friendly).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ...models.vit import ViTSpec

GroupKey = Tuple


def _keep_count(width: int, ratio: float, round_to: int) -> int:
    n_prune = int(ratio * width)
    keep = width - n_prune
    if round_to > 1:
        keep = int(round(keep / round_to)) * round_to
    return int(min(max(keep, min(round_to, width), 1), width))


def _head_importance(blk, heads: int, hd: int, p: int) -> np.ndarray:
    """p-norm of each head's qkv columns + proj rows."""
    qkv_w = np.asarray(blk["qkv"]["w"], np.float64)  # (d, 3·H·hd)
    d = qkv_w.shape[0]
    per_head = qkv_w.reshape(d, 3, heads, hd)
    proj_w = np.asarray(blk["proj"]["w"], np.float64).reshape(heads, hd, -1)
    score = np.zeros(heads)
    for h in range(heads):
        chunk = np.concatenate(
            [per_head[:, :, h, :].ravel(), proj_w[h].ravel()]
        )
        score[h] = np.abs(chunk).sum() if p == 1 else np.sqrt((chunk**2).sum())
    return score


def _mlp_importance(blk, p: int) -> np.ndarray:
    w1 = np.asarray(blk["mlp1"]["w"], np.float64)  # (d, hidden)
    w2 = np.asarray(blk["mlp2"]["w"], np.float64)  # (hidden, d)
    v1 = np.abs(w1).sum(0) if p == 1 else np.sqrt((w1**2).sum(0))
    v2 = np.abs(w2).sum(1) if p == 1 else np.sqrt((w2**2).sum(1))
    v1 = v1 / (v1.mean() + 1e-12)
    v2 = v2 / (v2.mean() + 1e-12)
    return (v1 + v2) / 2


def select_vit_channels(
    spec: ViTSpec,
    params,
    *,
    ratio: float,
    method: str = "l2",
    round_to: int = 1,
    prune_heads: bool = True,
    rng: Optional[np.random.Generator] = None,
) -> Dict[GroupKey, np.ndarray]:
    """→ {("mlp", i): kept channel idx, ("heads", i): kept head idx}."""
    if method not in ("l1", "l2", "random"):
        raise ValueError(f"vit pruning supports l1/l2/random, got {method!r}")
    p = 1 if method == "l1" else 2
    hd = spec.head_dim
    keep: Dict[GroupKey, np.ndarray] = {}
    for i in range(spec.depth):
        blk = params["blocks"][str(i)]
        hidden = blk["mlp1"]["w"].shape[1]
        if method == "random":
            assert rng is not None
            s_mlp = rng.random(hidden)
        else:
            s_mlp = _mlp_importance(blk, p)
        n = _keep_count(hidden, ratio, round_to)
        keep[("mlp", i)] = np.sort(np.argsort(-s_mlp)[:n])

        if prune_heads:
            heads = blk["qkv"]["w"].shape[1] // (3 * hd)
            if method == "random":
                s_h = rng.random(heads)
            else:
                s_h = _head_importance(blk, heads, hd, p)
            nh = max(heads - int(ratio * heads), 1)
            keep[("heads", i)] = np.sort(np.argsort(-s_h)[:nh])
    return keep


def apply_vit_pruning(
    spec: ViTSpec, params, keep: Dict[GroupKey, np.ndarray]
) -> Tuple[ViTSpec, dict]:
    """Physically slice MLP channels and whole heads; return the smaller model."""
    import copy

    params = copy.deepcopy(jax.device_get(params))
    hd = spec.head_dim
    mlp_hidden = [spec.block_mlp_hidden(i) for i in range(spec.depth)]
    head_counts = [spec.block_heads(i) for i in range(spec.depth)]

    for i in range(spec.depth):
        blk = params["blocks"][str(i)]
        if ("mlp", i) in keep:
            idx = np.asarray(keep[("mlp", i)])
            blk["mlp1"]["w"] = np.take(np.asarray(blk["mlp1"]["w"]), idx, axis=1)
            blk["mlp1"]["b"] = np.take(np.asarray(blk["mlp1"]["b"]), idx, axis=0)
            blk["mlp2"]["w"] = np.take(np.asarray(blk["mlp2"]["w"]), idx, axis=0)
            mlp_hidden[i] = len(idx)
        if ("heads", i) in keep:
            hidx = np.asarray(keep[("heads", i)])
            heads = np.asarray(blk["qkv"]["w"]).shape[1] // (3 * hd)
            d_in = np.asarray(blk["qkv"]["w"]).shape[0]
            # qkv columns: (d, 3, H, hd) → take heads on axis 2
            w = np.asarray(blk["qkv"]["w"]).reshape(d_in, 3, heads, hd)
            blk["qkv"]["w"] = np.take(w, hidx, axis=2).reshape(d_in, -1)
            b = np.asarray(blk["qkv"]["b"]).reshape(3, heads, hd)
            blk["qkv"]["b"] = np.take(b, hidx, axis=1).reshape(-1)
            # proj rows: (H, hd, d) → take heads on axis 0
            pw = np.asarray(blk["proj"]["w"]).reshape(heads, hd, -1)
            blk["proj"]["w"] = np.take(pw, hidx, axis=0).reshape(len(hidx) * hd, -1)
            head_counts[i] = len(hidx)

    new_spec = spec.with_widths(head_counts=head_counts, mlp_hidden=mlp_hidden)
    return new_spec, params


def prune_vit(
    spec: ViTSpec,
    params,
    state,
    *,
    ratio: float,
    method: str = "l2",
    round_to: int = 1,
    prune_heads: bool = True,
    seed: int = 42,
    keep: Optional[Dict[GroupKey, np.ndarray]] = None,
    **_ignored,
) -> Tuple[ViTSpec, dict, dict]:
    """One-shot structured ViT pruning (same surface as prune_model)."""
    if keep is None:
        keep = select_vit_channels(
            spec, params, ratio=ratio, method=method, round_to=round_to,
            prune_heads=prune_heads, rng=np.random.default_rng(seed),
        )
    new_spec, new_params = apply_vit_pruning(spec, params, keep)
    return new_spec, new_params, state
