"""Per-layer quantization sensitivity (compress/quant/sensitivity.py)."""

import logging

import numpy as np

import jax


def _engine(spec, params, state, batch_size=8):
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )

    class Cfg:
        DEBUG_MODE = False
        image_size = (32, 32)
        compute_dtype = "float32"
        calibration_images = 32
        observer = "minmax"
        percentile = 99.99

    Cfg.batch_size = batch_size
    return QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("s"))


def _check_rows(rows, expected_taps):
    by_tap = {r["tap"]: r for r in rows}
    assert expected_taps <= set(by_tap), set(by_tap)
    assert {"__weights__", "__all__"} <= set(by_tap)
    for r in rows:
        assert np.isfinite(r["logit_rmse"]) and r["logit_rmse"] >= 0.0
        assert 0.0 <= r["top1_flips"] <= 1.0
    # tap rows come first, sorted most-sensitive-first
    tap_rows = [r for r in rows if not r["tap"].startswith("__")]
    rmses = [r["logit_rmse"] for r in tap_rows]
    assert rmses == sorted(rmses, reverse=True)
    # the full int8 simulation distorts more than nothing at all
    assert by_tap["__all__"]["logit_rmse"] > 0.0
    return by_tap


def test_sensitivity_vit_tiny():
    from tests.test_vit import _tiny_vit

    spec, params, state = _tiny_vit(seed=7)
    eng = _engine(spec, params, state)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (32, 32, 32, 3)).astype(np.uint8)
    labels = np.zeros(32, np.int32)
    rows = eng.sensitivity((imgs, labels))
    expected = {f"b{i}{n}" for i in range(spec.depth)
                for n in ("qkv", "proj", "mlp1", "mlp2")} | {"head"}
    by_tap = _check_rows(rows, expected)
    assert "input" not in by_tap  # deployed stems consume exact uint8


def test_sensitivity_resnet18():
    from inference_efficient_vision_models_tpu.models import create_model

    with jax.default_device(jax.devices("cpu")[0]):
        spec, params, state = create_model("resnet18", num_classes=6)
    eng = _engine(spec, params, state)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8)
    rows = eng.sensitivity((imgs, np.zeros(16, np.int32)))
    by_tap = _check_rows(rows, {"stem", "feat"})
    # one row per calibrated quantization point (convs + fc), input excluded
    assert len(by_tap) > 10
