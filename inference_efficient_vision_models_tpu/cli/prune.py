"""Stage 3: structured pruning + fine-tuning.

TPU-native rebuild of `pruning/main.py` (reference :52-244): per fold, load
the stage-2 distilled student, measure baseline metrics, prune (one-shot
channel removal), re-measure, fine-tune, re-measure, save the pruned model
as a dense checkpoint + width-descriptor JSON (NOT a pickled module), and
emit the three-row comparison table per fold.
"""

from __future__ import annotations

import os

from ..core import PruningConfig, artifacts
from ..metrics.report import summarize_folds
from ..compress.prune import StructuredPruningEngine
from ..compress.prune.engine import taylor_grads_accumulated
from .teacher import load_stage_model


def _metrics_row(fold, phase, m):
    return {"fold": fold, "phase": phase, **m}


def run_prune(cfg, logger, data, split):
    from .common import fold_arrays, iter_folds
    from ..data.pipeline import Batches

    rows = []
    for fold in iter_folds(cfg):
        logger.info("===== fold %d/%d =====", fold, cfg.num_folds - 1)
        src_dir = os.path.join(cfg.student_exp_path, f"fold_{fold}")
        try:
            spec, params, state = load_stage_model(src_dir, cfg.test_ckpt_type)
        except FileNotFoundError:
            logger.warning("fold %d: student missing in %s — skipping", fold, src_dir)
            continue
        train_d, val_d, test_d = fold_arrays(data, split, fold)

        engine = StructuredPruningEngine(cfg, spec, params, state, logger)
        rows.append(_metrics_row(fold, "baseline", engine.evaluate_metrics(test_d, "baseline")))

        def _taylor_grads_fn(spec_, params_, state_):
            # cfg.taylor_batches-batch mean gradient (the reference's single
            # `pruner.step()` sees one batch — noise-dominated; VERDICT r3).
            it = iter(Batches(train_d[0], train_d[1], cfg.batch_size))
            batches = [b for _, b in zip(range(cfg.taylor_batches), it)]
            return taylor_grads_accumulated(spec_, params_, state_, batches)

        grads_fn = _taylor_grads_fn if cfg.pruning_method == "taylor" else None
        if cfg.iterative_steps > 1:
            engine.prune_iterative(train_d, val_d, cfg.fold_dir(fold), grads_fn=grads_fn)
        else:
            engine.prune_model(grads=grads_fn(spec, params, state) if grads_fn else None)
            engine.recalibrate(train_d)
        rows.append(_metrics_row(fold, "pruned", engine.evaluate_metrics(test_d, "pruned")))

        if cfg.finetune_epochs > 0:
            engine.finetune(train_d, val_d, cfg.fold_dir(fold))
            rows.append(
                _metrics_row(fold, "pruned+ft", engine.evaluate_metrics(test_d, "pruned+ft"))
            )

        artifacts.save_checkpoint(
            cfg.fold_dir(fold), artifacts.BEST, engine.params, engine.state, engine.spec
        )
        artifacts.save_checkpoint(
            cfg.fold_dir(fold), artifacts.LAST, engine.params, engine.state, engine.spec
        )
        from ..core.provenance import stage_record, write_provenance

        write_provenance(cfg.fold_dir(fold), stage_record(
            cfg, "pruning", fold, source_dir=src_dir,
            model_type="pruned", spec_name=engine.spec.name,
            pruning_ratio=cfg.pruning_ratio, pruning_method=cfg.pruning_method,
            round_to=cfg.round_to, global_pruning=cfg.global_pruning,
            iterative_steps=cfg.iterative_steps,
            finetune_epochs=cfg.finetune_epochs,
        ))
        logger.info("saved pruned model → %s", cfg.fold_dir(fold))
    summarize_folds(rows, cfg.output_dir, logger, name="results")
    return rows


def run_test(cfg, logger, data):
    from .common import iter_folds

    rows = []
    for fold in iter_folds(cfg):
        fold_dir = cfg.fold_dir(fold)
        try:
            spec, params, state = load_stage_model(fold_dir, cfg.test_ckpt_type)
        except FileNotFoundError:
            logger.warning("fold %d: pruned checkpoint missing — skipping", fold)
            continue
        engine = StructuredPruningEngine(cfg, spec, params, state, logger)
        rows.append(_metrics_row(fold, "pruned", engine.evaluate_metrics(data["test"], "pruned")))
    summarize_folds(rows, cfg.output_dir, logger, name="results")
    return rows


def main(argv=None):
    from .common import make_config, setup_stage

    cfg = make_config(PruningConfig, argv)
    logger, _, data, split = setup_stage(cfg)
    if cfg.choice == 1:
        return run_prune(cfg, logger, data, split)
    return run_test(cfg, logger, data)
