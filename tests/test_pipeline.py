"""End-to-end pipeline chaining test: all four stage CLIs, tiny synthetic run.

The TPU-rebuild equivalent of the reference's DEBUG_MODE smoke workflow
(SURVEY.md §4): stage N's artifacts must load cleanly in stage N+1 through
the on-disk contract (fold dirs, msgpack checkpoints, spec JSONs, split
file). Uses a temp artifacts_root so nothing touches the repo output tree.
"""

import json
import os

import numpy as np
import pytest

from inference_efficient_vision_models_tpu.cli import kd, prune, quantize, teacher


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pipeline"))


COMMON = [
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


def _args(root, extra):
    return [f"artifacts_root='{root}'"] + COMMON + extra


def test_iter_folds_subset():
    """folds=… runs a subset of the persisted split (single-fold A/B runs)."""
    from inference_efficient_vision_models_tpu.cli.common import iter_folds
    from inference_efficient_vision_models_tpu.core.config import QuantConfig

    assert list(iter_folds(QuantConfig())) == [0, 1, 2, 3, 4]
    assert list(iter_folds(QuantConfig(folds=(0,)))) == [0]
    assert list(iter_folds(QuantConfig(folds=(1, 3)))) == [1, 3]
    assert list(iter_folds(QuantConfig(folds=2))) == [2]  # bare-int CLI form
    with pytest.raises(ValueError):
        iter_folds(QuantConfig(folds=(5,)))


@pytest.mark.slow
def test_stage1_teacher(pipeline_root):
    res = teacher.main(_args(pipeline_root, ["choice=1", "model_name='resnet18'"]))
    assert len(res) == 2
    for fold in range(2):
        d = os.path.join(pipeline_root, "teacher_training", "test", f"fold_{fold}")
        assert os.path.exists(os.path.join(d, "model_best.msgpack"))
        assert os.path.exists(os.path.join(d, "model_best.spec.json"))
    assert os.path.exists(
        os.path.join(pipeline_root, "teacher_training", "test", "fold_idx_dict.json")
    )


@pytest.mark.slow
def test_stage2_kd(pipeline_root):
    res = kd.main(_args(pipeline_root, [
        "choice=1", "teacher_model='resnet18'", "student_model='resnet18'",
        "alpha=0.5", "temperature=4.0",
    ]))
    assert len(res) == 2
    # KD reuses the SAME split the teacher persisted (one canonical split)
    with open(os.path.join(pipeline_root, "teacher_training", "test", "fold_idx_dict.json")) as f:
        t_split = json.load(f)
    with open(os.path.join(pipeline_root, "knowledge_distillation", "test", "fold_idx_dict.json")) as f:
        k_split = json.load(f)
    assert t_split == k_split


@pytest.mark.slow
def test_stage3_prune(pipeline_root):
    rows = prune.main(_args(pipeline_root, [
        "choice=1", "pruning_ratio=0.2", "round_to=8", "finetune_epochs=1",
    ]))
    phases = {(r["fold"], r["phase"]) for r in rows}
    assert (0, "baseline") in phases and (0, "pruned+ft") in phases
    by = {(r["fold"], r["phase"]): r for r in rows}
    assert by[(0, "pruned")]["Params (M)"] < by[(0, "baseline")]["Params (M)"] * 0.85
    spec_json = os.path.join(
        pipeline_root, "pruning", "test", "fold_0", "model_best.spec.json"
    )
    with open(spec_json) as f:
        spec = json.load(f)
    assert all(w % 8 == 0 for w in spec["stage_widths"])


@pytest.mark.slow
def test_stage3_prune_taylor_and_global(pipeline_root):
    """CLI pass-through of the alternative pruning criteria."""
    rows = prune.main(_args(pipeline_root, [
        "choice=1", "experiment_name='taylor'", "pruning_method='taylor'",
        "pruning_ratio=0.15", "finetune_epochs=0", "num_folds=2",
    ]))
    assert any(r["phase"] == "pruned" for r in rows)
    rows = prune.main(_args(pipeline_root, [
        "choice=1", "experiment_name='glob'", "pruning_method='l1'",
        "global_pruning=True", "pruning_ratio=0.15", "finetune_epochs=0",
        "num_folds=2",
    ]))
    by = {(r["fold"], r["phase"]): r for r in rows}
    assert by[(0, "pruned")]["Params (M)"] < by[(0, "baseline")]["Params (M)"]


@pytest.mark.slow
def test_stage3_prune_iterative(pipeline_root):
    """Gradual pruning: 2 prune→finetune cycles through the CLI reach the
    same compounded ratio as one-shot and save a loadable artifact."""
    rows = prune.main(_args(pipeline_root, [
        "choice=1", "experiment_name='iter'", "pruning_ratio=0.2",
        "iterative_steps=2", "iterative_ft_epochs=1", "finetune_epochs=0",
        "num_folds=2",
    ]))
    by = {(r["fold"], r["phase"]): r for r in rows}
    assert by[(0, "pruned")]["Params (M)"] < by[(0, "baseline")]["Params (M)"] * 0.85
    spec_json = os.path.join(
        pipeline_root, "pruning", "iter", "fold_0", "model_best.spec.json"
    )
    assert os.path.exists(spec_json)


@pytest.mark.slow
def test_stage4_quantize(pipeline_root):
    rows = quantize.main(_args(pipeline_root, [
        "model_type='pruned'", "calibration_images=32",
    ]))
    methods = {r["method"] for r in rows}
    assert {"fp32", "static_int8", "dynamic_int8", "fp16"} <= methods
    by = {(r["fold"], r["method"]): r for r in rows}
    int8 = by[(0, "static_int8")]
    fp32 = by[(0, "fp32")]
    assert int8["Compression"] > 3.5  # reference headline: 3.95x
    # int8 accuracy within 10 points of fp32 on this tiny run (0.5% on real data)
    assert abs(int8["Accuracy"] - fp32["Accuracy"]) <= 10.0
    assert os.path.exists(
        os.path.join(pipeline_root, "quantization", "test", "fold_0", "model_static_int8.msgpack")
    )
