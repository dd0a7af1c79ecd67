"""Training orchestration shared by all stages.

Replaces the reference's four near-identical epoch loops
(`teacher_training/main.py:75-119`, `knowledge_distillation/main.py:134-188`,
`pruning/pruning_engine_structured.py:75-129`) with one implementation:
per-epoch train + validate, best-val checkpoint tracking, training_log.json
history, DEBUG_MODE early batch exit (2 batches, like
`teacher_training/train.py:20-21`).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax

from ..core import artifacts
from ..data.pipeline import Batches
from ..utils import device_materialize
from . import steps as steps_mod
from .optim import adamw_init


def _maybe_mesh(cfg):
    """Data-parallel mesh over all local devices (None on a single chip)."""
    import jax

    if jax.device_count() <= 1:
        return None
    from ..parallel import make_mesh

    return make_mesh(model_parallel=1)


def _run_epoch(step_fn, carry, loader, extra_args=(), debug_mode=False, mesh=None):
    """Drive one epoch; returns (carry, mean_loss, mean_acc, seconds)."""
    t0 = time.time()
    tot_loss = tot_acc = tot_n = 0.0
    place = None
    if mesh is not None:
        from ..parallel import shard_batch

        place = lambda b: shard_batch(mesh, b)  # noqa: E731
    bar = _progress(loader)
    device_metrics = []  # stay on device: a host sync per step would
    # serialize the loop on dispatch latency (costly over remote transports)
    for i, batch in enumerate(bar):
        if debug_mode and i == 2:
            break
        if place is not None:
            batch = place(batch)
        params, state, opt = carry
        params, state, opt, m = step_fn(params, state, opt, *extra_args, batch)
        carry = (params, state, opt)
        device_metrics.append(m)
        if hasattr(bar, "set_postfix") and i % 25 == 24:
            # fetch a LAGGED metric (several steps old, so its value is
            # already resident) to keep the hot loop free of per-step syncs
            bar.set_postfix(loss=f"{float(device_metrics[-20]['loss']):.4f}")
    for m in jax.device_get(device_metrics):
        n = float(m["n"])
        tot_loss += float(m["loss"]) * n
        tot_acc += float(m["acc"]) * n
        tot_n += n
    return carry, tot_loss / max(tot_n, 1), tot_acc / max(tot_n, 1), time.time() - t0


def _progress(loader):
    """tqdm bar on interactive terminals (reference wraps every loop in tqdm,
    `teacher_training/train.py:19`); plain iteration otherwise."""
    import sys

    if not sys.stderr.isatty():
        return loader
    try:
        from tqdm import tqdm

        return tqdm(loader, total=len(loader), leave=False)
    except ImportError:
        return loader


def evaluate(
    eval_step, params, state, loader, debug_mode=False, mesh=None
) -> Dict[str, float]:
    """Returns {'loss', 'acc', 'n'} (fractions, not percents)."""
    place = None
    if mesh is not None:
        from ..parallel import shard_batch

        place = lambda b: shard_batch(mesh, b)  # noqa: E731
    outs = []
    for i, batch in enumerate(loader):
        if debug_mode and i == 2:
            break
        if place is not None:
            batch = place(batch)
        outs.append(eval_step(params, state, batch))
    sums = {"sum_loss": 0.0, "sum_correct": 0.0, "n": 0.0}
    for out in jax.device_get(outs):
        for k in sums:
            sums[k] += float(out[k])
    n = max(sums["n"], 1.0)
    return {"loss": sums["sum_loss"] / n, "acc": sums["sum_correct"] / n, "n": n}


def train_classifier(
    cfg,
    spec,
    params,
    state,
    train_data,
    val_data,
    fold_dir: str,
    logger,
    *,
    teacher=None,  # (teacher_spec, teacher_params, teacher_state) → KD mode
    epochs: Optional[int] = None,
    learning_rate: Optional[float] = None,
    save: bool = True,
    resume: Optional[bool] = None,
):
    """Train with best-val tracking; returns (params, state, history).

    ``teacher`` switches the step to knowledge distillation with
    cfg.alpha / cfg.temperature. ``resume`` (or cfg.resume) continues an
    interrupted run from the last checkpoint incl. optimizer state —
    preemption recovery the reference lacked (it always restarted).
    """
    epochs = epochs if epochs is not None else cfg.epochs
    lr = learning_rate if learning_rate is not None else cfg.learning_rate
    resume = getattr(cfg, "resume", False) if resume is None else resume

    mesh = _maybe_mesh(cfg)
    if mesh is not None:
        logger.info(
            "data-parallel over %d devices (mesh %s)",
            mesh.devices.size, dict(zip(mesh.axis_names, mesh.devices.shape)),
        )

    train_loader = Batches(
        train_data[0], train_data[1], cfg.batch_size, shuffle=True, seed=cfg.seed
    )
    val_loader = Batches(val_data[0], val_data[1], cfg.batch_size)

    schedule = None
    if getattr(cfg, "lr_schedule", "constant") != "constant":
        from .optim import make_lr_schedule

        schedule = make_lr_schedule(
            cfg.lr_schedule, lr, epochs * len(train_loader),
            warmup_steps=getattr(cfg, "warmup_steps", 0),
            min_fraction=getattr(cfg, "lr_min_fraction", 0.0),
        )
        logger.info("lr schedule: %s over %d steps", cfg.lr_schedule,
                    epochs * len(train_loader))

    from ..data.augment import make_augment_fn

    augment_fn = make_augment_fn(cfg)
    if augment_fn is not None:
        logger.info("train-time augmentation ON (crop_pad=%s flip=%s rot180=%s)",
                    getattr(cfg, "augment_crop_pad", 16),
                    getattr(cfg, "augment_flip", True),
                    getattr(cfg, "augment_rot180", False))
    if teacher is None:
        step = steps_mod.make_train_step(
            spec, learning_rate=lr, compute_dtype=cfg.compute_dtype,
            lr_schedule=schedule,
            augment_fn=augment_fn, augment_seed=cfg.seed,
        )
        extra = ()
    else:
        t_spec, t_params, t_state = teacher
        step = steps_mod.make_kd_train_step(
            spec,
            t_spec,
            alpha=cfg.alpha,
            temperature=cfg.temperature,
            learning_rate=lr,
            compute_dtype=cfg.compute_dtype,
            lr_schedule=schedule,
            sp_weight=float(getattr(cfg, "sp_weight", 0.0)),
            augment_fn=augment_fn, augment_seed=cfg.seed,
        )
        extra = (t_params, t_state)
    eval_step = steps_mod.make_eval_step(spec, compute_dtype=cfg.compute_dtype)

    history = {"train_loss": [], "train_acc": [], "val_loss": [], "val_acc": [], "epoch_time": []}
    best_acc, start_epoch = -1.0, 0
    opt = None
    if resume and artifacts.checkpoint_exists(fold_dir, artifacts.LAST):
        raw = artifacts.load_checkpoint_raw(fold_dir, artifacts.LAST)
        if "meta" in raw and "opt" in raw:
            from .optim import AdamWState

            params, state = raw["params"], raw["state"]
            opt = AdamWState(**raw["opt"])
            start_epoch = int(raw["meta"]["epoch"]) + 1
            best_acc = float(raw["meta"]["best_acc"])
            history = artifacts.load_training_log(fold_dir) or history
            # restore the shuffle schedule: epoch e draws order from
            # seed+e, so a resumed run continues the same batch-order
            # trajectory instead of re-seeing epoch 0's order
            train_loader.epoch = start_epoch
            logger.info(
                "resuming from epoch %d (best val acc %.2f%%)", start_epoch, best_acc * 100
            )

    params, state = device_materialize((params, state))
    if opt is None:
        opt = adamw_init(params)
    else:
        opt = device_materialize(opt)
    carry = (params, state, opt)

    best = None
    for epoch in range(start_epoch, epochs):
        carry, tr_loss, tr_acc, secs = _run_epoch(
            step, carry, train_loader, extra, cfg.DEBUG_MODE, mesh=mesh
        )
        val = evaluate(eval_step, carry[0], carry[1], val_loader, cfg.DEBUG_MODE, mesh=mesh)
        history["train_loss"].append(tr_loss)
        history["train_acc"].append(tr_acc)
        history["val_loss"].append(val["loss"])
        history["val_acc"].append(val["acc"])
        history["epoch_time"].append(secs)
        logger.info(
            "epoch %d/%d | train loss %.4f acc %.2f%% | val loss %.4f acc %.2f%% | %.1fs",
            epoch + 1, epochs, tr_loss, tr_acc * 100, val["loss"], val["acc"] * 100, secs,
        )
        if val["acc"] > best_acc:
            best_acc = val["acc"]
            best = (jax.device_get(carry[0]), jax.device_get(carry[1]))
            if save:
                artifacts.save_checkpoint(fold_dir, artifacts.BEST, best[0], best[1], spec)
                logger.info("new best val acc %.2f%% → model_best", best_acc * 100)
        if save:
            artifacts.save_checkpoint(
                fold_dir, artifacts.LAST, carry[0], carry[1], spec,
                opt=carry[2], meta={"epoch": epoch, "best_acc": best_acc},
            )
            artifacts.save_training_log(fold_dir, history)

    if save and history["train_loss"]:
        from ..metrics.plots import plot_training_curves

        plot_training_curves(fold_dir, history, title=spec.name)

    if best is None:  # epochs == 0 or resumed past the best epoch
        if resume and best_acc >= 0 and artifacts.checkpoint_exists(fold_dir, artifacts.BEST):
            raw = artifacts.load_checkpoint_raw(fold_dir, artifacts.BEST)
            best = (raw["params"], raw["state"])
        else:
            best = (jax.device_get(carry[0]), jax.device_get(carry[1]))
    return best[0], best[1], history
