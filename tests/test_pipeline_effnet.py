"""End-to-end 4-stage pipeline for the EfficientNet family — proves the
spec/pruner/quantizer abstractions generalize to MBConv + squeeze-excitation
(reference zoo generality: `teacher_training/utils.py:21-66`)."""

import json
import os

import pytest

from inference_efficient_vision_models_tpu.cli import kd, prune, quantize, teacher

COMMON = [
    "experiment_name='ef'",
    "DEBUG_MODE=False",
    "num_folds=2",
    "epochs=1",
    "batch_size=8",
    "image_size=(64, 64)",
    "synthetic_data=True",
    "synthetic_size=96",
    "compute_dtype='float32'",
    "pretrained=False",
]


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pipeline_effnet"))


def _args(root, extra):
    return [f"artifacts_root='{root}'"] + COMMON + extra


@pytest.mark.slow
def test_stage1_teacher_effnet(root):
    res = teacher.main(_args(root, ["choice=1", "model_name='efficientnet_b0'"]))
    assert len(res) == 2
    d = os.path.join(root, "teacher_training", "ef", "fold_0")
    assert os.path.exists(os.path.join(d, "model_best.msgpack"))
    with open(os.path.join(d, "model_best.spec.json")) as f:
        assert json.load(f)["__kind__"] == "efficientnet"


@pytest.mark.slow
def test_stage2_kd_effnet(root):
    res = kd.main(_args(root, [
        "choice=1", "teacher_exp_name='ef'",
        "teacher_model='efficientnet_b0'", "student_model='efficientnet_b0'",
        "alpha=0.5", "temperature=4.0",
    ]))
    assert len(res) == 2


@pytest.mark.slow
def test_stage3_prune_effnet(root):
    rows = prune.main(_args(root, [
        "choice=1", "source_exp_name='ef'", "pruning_ratio=0.2", "round_to=8",
        "finetune_epochs=1",
    ]))
    by = {(r["fold"], r["phase"]): r for r in rows}
    assert by[(0, "pruned")]["Params (M)"] < by[(0, "baseline")]["Params (M)"] * 0.9
    with open(os.path.join(root, "pruning", "ef", "fold_0", "model_best.spec.json")) as f:
        spec = json.load(f)
    assert spec["__kind__"] == "efficientnet"
    assert all(w % 8 == 0 for w in spec["stage_widths"])


@pytest.mark.slow
def test_stage4_quantize_effnet(root):
    rows = quantize.main(_args(root, [
        "model_type='pruned'", "pruning_exp_name='ef'", "calibration_images=32",
    ]))
    methods = {r["method"] for r in rows}
    assert {"fp32", "static_int8", "dynamic_int8", "fp16"} <= methods
    by = {(r["fold"], r["method"]): r for r in rows}
    int8, fp32 = by[(0, "static_int8")], by[(0, "fp32")]
    assert int8["Compression"] > 3.0
    assert abs(int8["Accuracy"] - fp32["Accuracy"]) <= 10.0
    # artifact reload path (serving) round-trips the effnet static model
    from inference_efficient_vision_models_tpu.serving import load_quantized

    fold_dir = os.path.join(root, "quantization", "ef", "fold_0")
    spec, model, fn, pre = load_quantized(fold_dir, "static_int8")
    assert pre is None  # no space-to-depth for the 3×3 stem
    import numpy as np

    logits = np.asarray(fn(np.zeros((2, 64, 64, 3), np.uint8)))
    assert logits.shape == (2, 6)
