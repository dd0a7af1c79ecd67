"""Preemption-resume test: interrupt after epoch 1, resume, verify the run
continues from the saved optimizer state and epoch counter."""

import logging

import numpy as np
import pytest

from inference_efficient_vision_models_tpu.core import TeacherConfig, artifacts
from inference_efficient_vision_models_tpu.data import make_synthetic_neudet
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.train import train_classifier


def _cfg(tmp_path, epochs):
    return TeacherConfig(
        experiment_name="resume",
        artifacts_root=str(tmp_path),
        batch_size=8,
        epochs=epochs,
        image_size=(32, 32),
        compute_dtype="float32",
        synthetic_data=True,
        synthetic_size=64,
        resume=True,
    )


@pytest.mark.slow
def test_resume_continues_from_last(tmp_path):
    imgs, labels = make_synthetic_neudet(10, 32, seed=0)
    train_d, val_d = (imgs[:48], labels[:48]), (imgs[48:], labels[48:])
    logger = logging.getLogger("resume")
    fold_dir = str(tmp_path / "fold_0")

    spec, params, state = create_model("resnet18", num_classes=6)

    # phase 1: train 1 epoch (simulated preemption after it)
    cfg1 = _cfg(tmp_path, epochs=1)
    train_classifier(cfg1, spec, params, state, train_d, val_d, fold_dir, logger)
    raw = artifacts.load_checkpoint_raw(fold_dir, "last")
    assert int(raw["meta"]["epoch"]) == 0
    step_after_1 = int(np.asarray(raw["opt"]["step"]))
    assert step_after_1 > 0

    # phase 2: rerun with epochs=3 → resumes at epoch 1, optimizer continues,
    # and the shuffle schedule continues (first resumed epoch must draw the
    # epoch-1 order, not restart at epoch 0's)
    import inference_efficient_vision_models_tpu.train.loop as loop_mod

    seen_epochs = []
    orig_iter = loop_mod.Batches.__iter__

    def spy_iter(self):
        if self.shuffle:
            seen_epochs.append(self.epoch)
        return orig_iter(self)

    loop_mod.Batches.__iter__ = spy_iter
    try:
        cfg2 = _cfg(tmp_path, epochs=3)
        _, _, hist = train_classifier(
            cfg2, spec, params, state, train_d, val_d, fold_dir, logger
        )
    finally:
        loop_mod.Batches.__iter__ = orig_iter
    assert seen_epochs[:2] == [1, 2], seen_epochs
    raw2 = artifacts.load_checkpoint_raw(fold_dir, "last")
    assert int(raw2["meta"]["epoch"]) == 2
    assert int(np.asarray(raw2["opt"]["step"])) == 3 * step_after_1
    assert len(hist["train_loss"]) == 3  # history accumulated across phases

    # phase 3: rerun again fully trained → no epochs run, best returned
    _, _, hist3 = train_classifier(
        cfg2, spec, params, state, train_d, val_d, fold_dir, logger
    )
    assert len(hist3["train_loss"]) == 3


@pytest.mark.slow
def test_fresh_run_without_resume(tmp_path):
    imgs, labels = make_synthetic_neudet(10, 32, seed=0)
    logger = logging.getLogger("resume2")
    spec, params, state = create_model("resnet18", num_classes=6)
    cfg = _cfg(tmp_path, epochs=1)
    cfg.resume = False
    fold_dir = str(tmp_path / "fold_0")
    train_classifier(cfg, spec, params, state, (imgs[:48], labels[:48]), (imgs[48:], labels[48:]), fold_dir, logger)
    raw = artifacts.load_checkpoint_raw(fold_dir, "last")
    assert int(raw["meta"]["epoch"]) == 0
    import os

    assert os.path.exists(os.path.join(fold_dir, "training_curves.png"))
