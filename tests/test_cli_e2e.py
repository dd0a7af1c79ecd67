"""End-to-end: all four stage CLIs driven over an ON-DISK BMP NEU-DET tree
(the reference's actual operating mode, `/root/reference/README.md:29-50`) —
teacher → KD → prune → quantize, then every stage's choice=2 reload path.

This is the closest this environment gets to real-data readiness: the data
loader scans/decodes real files (no synthetic shortcut), every cross-stage
artifact handoff goes through the filesystem, and the quantized artifacts
round-trip through the serving loader."""

import os

import numpy as np
import pytest

from tests.test_data_path import _make_neudet_tree

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_root = str(root / "NEU-DET")
    _make_neudet_tree(data_root, n_per_class=8, size=48)
    common = dict(
        data_dir=data_root,
        artifacts_root=str(root / "out"),
        synthetic_data=False,
        image_size=(48, 48),
        num_folds=2,
        epochs=1,
        batch_size=8,
        compute_dtype="float32",
        pretrained=False,
        experiment_name="e2e",
    )
    return root, common


def _argv(common, **extra):
    return [f"{k}={v!r}" if isinstance(v, str) else f"{k}={v}"
            for k, v in {**common, **extra}.items()]


def test_stage1_teacher_cli(pipeline_env):
    from inference_efficient_vision_models_tpu.cli import teacher

    root, common = pipeline_env
    teacher.main(_argv(common, choice=1, model_name="resnet18", learning_rate=1e-3))
    for fold in range(2):
        d = os.path.join(common["artifacts_root"], "teacher_training", "e2e", f"fold_{fold}")
        assert os.path.exists(os.path.join(d, "model_best.msgpack")), d
    teacher.main(_argv(common, choice=2, model_name="resnet18"))


def test_stage2_kd_cli(pipeline_env):
    from inference_efficient_vision_models_tpu.cli import kd

    root, common = pipeline_env
    kd.main(_argv(
        common, choice=1, teacher_exp_name="e2e",
        teacher_model="resnet18", student_model="resnet18",
        learning_rate=1e-3,
    ))
    for fold in range(2):
        d = os.path.join(common["artifacts_root"], "knowledge_distillation", "e2e", f"fold_{fold}")
        assert os.path.exists(os.path.join(d, "model_best.msgpack")), d
    kd.main(_argv(common, choice=2, teacher_exp_name="e2e",
                  teacher_model="resnet18", student_model="resnet18"))


def test_stage3_prune_cli(pipeline_env):
    from inference_efficient_vision_models_tpu.cli import prune

    root, common = pipeline_env
    prune.main(_argv(
        common, choice=1, source_exp_name="e2e", model_name="resnet18",
        pruning_ratio=0.12, round_to=8, finetune_epochs=1,
    ))
    for fold in range(2):
        d = os.path.join(common["artifacts_root"], "pruning", "e2e", f"fold_{fold}")
        assert os.path.exists(os.path.join(d, "model_best.msgpack")), d
        assert os.path.exists(os.path.join(d, "model_best.spec.json")), d


def test_stage4_quantize_cli_and_artifact_roundtrip(pipeline_env):
    from inference_efficient_vision_models_tpu.cli import quantize
    from inference_efficient_vision_models_tpu.serving import Predictor

    root, common = pipeline_env
    rows = quantize.main(_argv(
        common, choice=1, model_type="pruned", pruning_exp_name="e2e",
        student_model="resnet18", calibration_images=32,
        methods=("static_int8", "weight_only_int8"), sensitivity=True,
    ))
    by_method = {}
    for r in rows:
        by_method.setdefault(r["method"], []).append(r["Accuracy"])
    assert set(by_method) >= {"fp32", "static_int8", "weight_only_int8"}, by_method

    # sensitivity=True wrote the per-fold tap-sensitivity CSV next to the
    # summary (stem/feat + one row per conv tap + the two aggregates)
    import csv

    qdir = os.path.join(common["artifacts_root"], "quantization", "e2e")
    for fold in range(2):
        with open(os.path.join(qdir, f"sensitivity_fold{fold}.csv")) as f:
            srows = list(csv.DictReader(f))
        taps = {r["tap"] for r in srows}
        assert {"stem", "feat", "__weights__", "__all__"} <= taps, taps
        assert all(float(r["logit_rmse"]) >= 0 for r in srows)

    # choice=2: reload every saved artifact and re-evaluate
    rows2 = quantize.main(_argv(
        common, choice=2, model_type="pruned", pruning_exp_name="e2e",
        methods=("static_int8", "weight_only_int8"),
    ))
    reload_by_method = {}
    for r in rows2:
        reload_by_method.setdefault(r["method"], []).append(r["Accuracy"])
    # reload accuracies match the fresh-conversion numbers exactly
    for m in ("static_int8", "weight_only_int8"):
        np.testing.assert_allclose(
            sorted(reload_by_method[m]), sorted(by_method[m]), atol=1e-9,
            err_msg=f"choice=2 reload accuracy drifted for {m}",
        )

    # and the serving runtime consumes the artifact directly
    fold_dir = os.path.join(common["artifacts_root"], "quantization", "e2e", "fold_0")
    p = Predictor.from_artifact(fold_dir, "static_int8", batch_size=8)
    imgs = np.random.default_rng(0).integers(0, 255, (8, 48, 48, 3)).astype(np.uint8)
    assert p.predict(imgs).shape == (8,)


def test_provenance_chain(pipeline_env):
    """Every stage wrote a provenance sidecar and stage 4's chains all the
    way back to the teacher — the machinery that makes bench.py's flagship
    selection structural (core/provenance.py)."""
    import json

    root, common = pipeline_env
    q = os.path.join(common["artifacts_root"], "quantization", "e2e",
                     "fold_0", "provenance.json")
    with open(q) as f:
        prov = json.load(f)
    assert prov["stage"] == "quantization"
    assert prov["model_type"] == "pruned"
    assert prov["spec_name"] == "resnet18"
    assert prov["stage_widths"] != [64, 128, 256, 512]  # physically pruned
    assert prov["data"]["num_folds"] == 2
    up = prov["upstream"]
    assert up["stage"] == "pruning"
    assert up["pruning_ratio"] == 0.12 and up["round_to"] == 8
    up2 = up["upstream"]
    assert up2["stage"] == "knowledge_distillation"
    assert up2["model_type"] == "student"
    assert up2["upstream"]["stage"] == "teacher_training"
