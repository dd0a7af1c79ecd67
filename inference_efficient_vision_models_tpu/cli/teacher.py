"""Stage 1: teacher baseline training.

TPU-native rebuild of `teacher_training/main.py` (reference :27-174):
choice=1 → 5-fold CV training of the teacher (default resnet50) with
best-val checkpointing; choice=2 → reload per-fold checkpoints and evaluate
on the held-out test split.
"""

from __future__ import annotations

import jax

from ..core import TeacherConfig, artifacts
from ..core.prng import key_for
from ..data.pipeline import Batches
from ..metrics.report import summarize_folds
from ..models import create_model
from ..train import make_eval_step, train_classifier
from ..train.loop import evaluate
from ..utils import cpu_device, device_materialize


def load_stage_model(fold_dir: str, which: str):
    """Rebuild (spec, params, state) from a stage checkpoint + spec JSON."""
    spec_dict = artifacts.load_spec_dict(fold_dir, which)
    if spec_dict is None:
        raise FileNotFoundError(f"no spec JSON in {fold_dir}")
    from ..models.registry import spec_from_dict

    spec = spec_from_dict(spec_dict)
    raw = artifacts.load_checkpoint_raw(fold_dir, which)
    return spec, raw["params"], raw["state"]


def run_train(cfg, logger, data, split):
    from .common import fold_arrays, iter_folds

    results = []
    for fold in iter_folds(cfg):
        logger.info("===== fold %d/%d =====", fold, cfg.num_folds - 1)
        train_d, val_d, test_d = fold_arrays(data, split, fold)
        with jax.default_device(cpu_device()):
            spec, params, state = create_model(
                cfg.model_name,
                cfg.num_classes,
                key=key_for(jax.random.PRNGKey(cfg.seed), "fold", fold, "init"),
                pretrained=cfg.pretrained,
                logger=logger,
            )
        params, state, hist = train_classifier(
            cfg, spec, params, state, train_d, val_d, cfg.fold_dir(fold), logger
        )
        from ..core.provenance import stage_record, write_provenance

        write_provenance(cfg.fold_dir(fold), stage_record(
            cfg, "teacher_training", fold,
            model_type="teacher", model_name=cfg.model_name,
            epochs=cfg.epochs, learning_rate=cfg.learning_rate,
            pretrained=bool(cfg.pretrained),
        ))
        eval_step = make_eval_step(spec, compute_dtype=cfg.compute_dtype)
        params, state = device_materialize((params, state))
        test = evaluate(
            eval_step, params, state,
            Batches(test_d[0], test_d[1], cfg.batch_size), cfg.DEBUG_MODE,
        )
        logger.info("fold %d test: loss %.4f acc %.2f%%", fold, test["loss"], test["acc"] * 100)
        results.append({"fold": fold, "test_loss": test["loss"], "test_acc": test["acc"]})
    summarize_folds(results, cfg.output_dir, logger, name="teacher_results")
    return results


def run_test(cfg, logger, data):
    from .common import iter_folds

    results = []
    for fold in iter_folds(cfg):
        fold_dir = cfg.fold_dir(fold)
        try:
            spec, params, state = load_stage_model(fold_dir, cfg.test_ckpt_type)
        except FileNotFoundError:
            logger.warning("fold %d: checkpoint missing in %s — skipping", fold, fold_dir)
            continue
        params, state = device_materialize((params, state))
        eval_step = make_eval_step(spec, compute_dtype=cfg.compute_dtype)
        test_d = data["test"]
        test = evaluate(
            eval_step, params, state,
            Batches(test_d[0], test_d[1], cfg.batch_size), cfg.DEBUG_MODE,
        )
        logger.info("fold %d test: loss %.4f acc %.2f%%", fold, test["loss"], test["acc"] * 100)
        results.append({"fold": fold, "test_loss": test["loss"], "test_acc": test["acc"]})
    summarize_folds(results, cfg.output_dir, logger, name="teacher_results")
    return results


def main(argv=None):
    from .common import make_config, setup_stage

    cfg = make_config(TeacherConfig, argv)
    logger, _, data, split = setup_stage(cfg)
    if cfg.choice == 1:
        return run_train(cfg, logger, data, split)
    return run_test(cfg, logger, data)
