"""Shared CLI orchestration for the four pipeline stages.

Keeps the reference's contract: no-flag entry points whose behavior is set by
the config's ``choice`` (1 = train/compress, 2 = test), per-fold loops over a
persisted CV split, per-fold artifact dirs. Adds ``key=value`` CLI overrides
(the reference's config classes already accepted kwargs —
`teacher_config.py:44-46` — but its CLIs never passed any).
"""

from __future__ import annotations

import ast
import os
import sys
from typing import Dict, Tuple, Type

import numpy as np

from ..core import artifacts, get_logger, set_seed
from ..data import load_dataset
from ..data.splits import create_fold_split_idx


def _apply_platform_override() -> None:
    """Honor ``IEVM_PLATFORM=cpu|tpu`` for the stage CLIs.

    ``JAX_PLATFORMS`` alone is ignored when a TPU platform plugin is
    registered; ``jax.config.update("jax_platforms", ...)`` before first
    backend use is authoritative (same mechanism as tests/conftest.py). Lets
    the pipeline run on the host backend when the TPU link is unavailable.
    """
    plat = os.environ.get("IEVM_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


_apply_platform_override()


def parse_cli_kwargs(argv=None) -> Dict:
    """['choice=1', 'DEBUG_MODE=True'] → {'choice': 1, 'DEBUG_MODE': True}."""
    argv = argv if argv is not None else sys.argv[1:]
    out = {}
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(f"arguments must be key=value, got {arg!r}")
        k, v = arg.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def make_config(cfg_cls: Type, argv=None):
    return cfg_cls(**parse_cli_kwargs(argv))


def iter_folds(cfg):
    """Folds a stage run covers: ``cfg.folds`` if set (validated against the
    split arity), else all ``num_folds``. A bare int is accepted for
    ``folds=2``-style CLI overrides."""
    if cfg.folds is None:
        return range(cfg.num_folds)
    folds = (cfg.folds,) if isinstance(cfg.folds, int) else tuple(cfg.folds)
    bad = [f for f in folds if not 0 <= int(f) < cfg.num_folds]
    if bad:
        raise ValueError(f"folds {bad} outside the {cfg.num_folds}-fold split")
    return [int(f) for f in folds]


def setup_stage(cfg) -> Tuple:
    """Common preamble: logger, seed, dataset, persisted fold split.

    Returns (logger, root_key, data, fold_idx_dict). The split derivation is
    deterministic (one canonical implementation, same seed), so every stage
    reconstructs the identical split and persists it to its own
    fold_idx_dict.json — verified identical across stages in
    tests/test_pipeline.py (fixes reference split divergence, SURVEY.md §2.3).
    """
    from ..parallel import initialize_distributed
    from ..utils import enable_compilation_cache

    initialize_distributed()  # no-op unless multi-process coordinates are set
    enable_compilation_cache()
    logger = get_logger(cfg)
    logger.info("config: %r", cfg)
    root_key = set_seed(cfg.seed)
    data = load_dataset(cfg, logger)
    split = artifacts.load_fold_split(cfg.output_dir)
    if split is None or len(split) != cfg.num_folds:
        split = create_fold_split_idx(cfg.num_folds, data["train"][1], cfg.seed)
        artifacts.save_fold_split(cfg.output_dir, split)
        logger.info("created %d-fold split", cfg.num_folds)
    else:
        logger.info("reusing persisted %d-fold split", len(split))
    return logger, root_key, data, split


def fold_arrays(data, split, fold: int):
    """→ ((train_imgs, train_labels), (val_imgs, val_labels), (test_imgs, test_labels))."""
    imgs, labels = data["train"]
    tr = np.asarray(split[fold]["train"])
    va = np.asarray(split[fold]["val"])
    return (
        (imgs[tr], labels[tr]),
        (imgs[va], labels[va]),
        data["test"],
    )
