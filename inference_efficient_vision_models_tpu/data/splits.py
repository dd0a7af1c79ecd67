"""Canonical cross-validation splits.

The reference had three diverging split implementations: the teacher used key
``"val"`` (`teacher_training/utils.py:69-76`), KD/pruning used
``"validation"``, and quantization alone used ``shuffle=True``
(`quantization/utils.py:16-29`) so its calibration folds didn't match the
training folds (SURVEY.md §2.3). This module is the single source of truth:
deterministic stratified K-fold, keys ``{"train", "val"}``, persisted once to
``fold_idx_dict.json`` (core.artifacts) and reloaded by every later stage.

Semantics match sklearn's ``StratifiedKFold(shuffle=False)``: within each
class, samples are dealt to folds in contiguous chunks ordered by class.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def create_fold_split_idx(
    num_folds: int, cls_ids: Sequence[int], seed: int | None = None
) -> Dict[int, Dict[str, list]]:
    """Stratified K-fold over labels; returns {fold: {"train": [...], "val": [...]}}.

    ``seed`` is accepted for interface stability but unused when shuffle-free
    (reference default); pass a seed-shuffled label order upstream if needed.
    """
    from sklearn.model_selection import StratifiedKFold

    y = np.asarray(cls_ids)
    if num_folds < 1:
        raise ValueError("num_folds must be >= 1")
    # num_folds == 1 (DEBUG shrink, reference `p_config.py:70`): a single
    # stratified 80/20 holdout standing in for "fold 0".
    n_splits = 5 if num_folds == 1 else num_folds
    skf = StratifiedKFold(n_splits=n_splits)  # shuffle=False: reference default
    out: Dict[int, Dict[str, list]] = {}
    for k, (train, val) in enumerate(skf.split(np.zeros_like(y), y)):
        if k >= num_folds:
            break
        out[k] = {"train": train.tolist(), "val": val.tolist()}
    return out
