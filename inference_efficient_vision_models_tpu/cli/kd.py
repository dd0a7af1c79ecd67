"""Stage 2: knowledge distillation.

TPU-native rebuild of `knowledge_distillation/main.py` (reference :62-237):
per fold, load the frozen stage-1 teacher checkpoint, train the student
(default resnet18) with the (1-α)·CE + α·KL·T² loss inside one jitted step,
track best-val checkpoints; choice=2 re-evaluates saved students.
"""

from __future__ import annotations

import os

import jax

from ..core import KDConfig
from ..core.prng import key_for
from ..data.pipeline import Batches
from ..metrics.report import summarize_folds
from ..models import create_model
from ..train import make_eval_step, train_classifier
from ..train.loop import evaluate
from ..utils import cpu_device, device_materialize
from .teacher import load_stage_model


def _load_teacher(cfg, fold: int, logger):
    """Load the stage-1 teacher for this fold (frozen).

    Accepts either our msgpack checkpoints or — for interop — a reference
    ``.pth`` file placed at the same path (cfg.teacher_checkpoint)."""
    if cfg.teacher_checkpoint and os.path.exists(cfg.teacher_checkpoint):
        from ..models import make_spec
        from ..models.torch_import import load_torch_checkpoint

        spec = make_spec(cfg.teacher_model, cfg.num_classes)
        params, state = load_torch_checkpoint(spec, cfg.teacher_checkpoint)
        logger.info("loaded torch teacher checkpoint %s", cfg.teacher_checkpoint)
        return spec, params, state
    fold_dir = os.path.join(cfg.resolve_teacher_path(), f"fold_{fold}")
    spec, params, state = load_stage_model(fold_dir, cfg.test_ckpt_type)
    logger.info("loaded teacher from %s", fold_dir)
    return spec, params, state


def run_train(cfg, logger, data, split):
    from .common import fold_arrays, iter_folds

    results = []
    for fold in iter_folds(cfg):
        logger.info("===== fold %d/%d =====", fold, cfg.num_folds - 1)
        try:
            teacher = _load_teacher(cfg, fold, logger)
        except FileNotFoundError as e:
            logger.warning("fold %d: teacher missing (%s) — skipping", fold, e)
            continue
        teacher = (teacher[0], *device_materialize((teacher[1], teacher[2])))
        train_d, val_d, test_d = fold_arrays(data, split, fold)
        with jax.default_device(cpu_device()):
            spec, params, state = create_model(
                cfg.student_model,
                cfg.num_classes,
                key=key_for(jax.random.PRNGKey(cfg.seed), "kd_fold", fold, "init"),
                pretrained=cfg.pretrained,
                logger=logger,
            )
        params, state, hist = train_classifier(
            cfg, spec, params, state, train_d, val_d, cfg.fold_dir(fold), logger,
            teacher=teacher,
        )
        from ..core.provenance import stage_record, write_provenance

        write_provenance(cfg.fold_dir(fold), stage_record(
            cfg, "knowledge_distillation", fold,
            source_dir=os.path.join(cfg.teacher_exp_path, f"fold_{fold}"),
            model_type="student", student_model=cfg.student_model,
            teacher_model=cfg.teacher_model, alpha=cfg.alpha,
            temperature=cfg.temperature, epochs=cfg.epochs,
        ))
        eval_step = make_eval_step(spec, compute_dtype=cfg.compute_dtype)
        params, state = device_materialize((params, state))
        test = evaluate(
            eval_step, params, state,
            Batches(test_d[0], test_d[1], cfg.batch_size), cfg.DEBUG_MODE,
        )
        logger.info("fold %d test: loss %.4f acc %.2f%%", fold, test["loss"], test["acc"] * 100)
        results.append({"fold": fold, "test_loss": test["loss"], "test_acc": test["acc"]})
    summarize_folds(results, cfg.output_dir, logger, name="kd_results")
    return results


def run_test(cfg, logger, data):
    from .common import iter_folds

    results = []
    for fold in iter_folds(cfg):
        fold_dir = cfg.fold_dir(fold)
        try:
            spec, params, state = load_stage_model(fold_dir, cfg.test_ckpt_type)
        except FileNotFoundError:
            logger.warning("fold %d: student checkpoint missing — skipping", fold)
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
    summarize_folds(results, cfg.output_dir, logger, name="kd_results")
    return results


def main(argv=None):
    from .common import make_config, setup_stage

    cfg = make_config(KDConfig, argv)
    logger, _, data, split = setup_stage(cfg)
    if cfg.choice == 1:
        return run_train(cfg, logger, data, split)
    return run_test(cfg, logger, data)
