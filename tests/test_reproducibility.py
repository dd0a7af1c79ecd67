"""Determinism: identical seeds → identical training trajectories.

The reference's determinism story is global seeding + cudnn.deterministic
(`teacher_training/utils.py:128-137`). Here determinism follows from
functional PRNG keys + XLA's deterministic CPU/TPU execution; this test
pins the contract.
"""

import logging

import numpy as np
import pytest

from inference_efficient_vision_models_tpu.core import TeacherConfig
from inference_efficient_vision_models_tpu.data import make_synthetic_neudet
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.train import train_classifier


@pytest.mark.slow
def test_same_seed_same_trajectory(tmp_path):
    imgs, labels = make_synthetic_neudet(8, 32, seed=0)
    histories = []
    for run in range(2):
        cfg = TeacherConfig(
            experiment_name=f"repro{run}",
            artifacts_root=str(tmp_path),
            batch_size=8,
            epochs=2,
            image_size=(32, 32),
            compute_dtype="float32",
            synthetic_data=True,
            seed=123,
        )
        import jax

        spec, params, state = create_model(
            "resnet18", num_classes=6, key=jax.random.PRNGKey(cfg.seed)
        )
        _, _, hist = train_classifier(
            cfg, spec, params, state, (imgs, labels), (imgs[:16], labels[:16]),
            str(tmp_path / f"fold{run}"), logging.getLogger("repro"), save=False,
        )
        histories.append(hist)
    np.testing.assert_array_equal(histories[0]["train_loss"], histories[1]["train_loss"])
    np.testing.assert_array_equal(histories[0]["val_acc"], histories[1]["val_acc"])
