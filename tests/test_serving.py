"""Serving runtime tests: artifact loading, pipelined prediction correctness."""

import logging
import os

import numpy as np
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.serving import Predictor, load_quantized


class _Cfg:
    batch_size = 8
    calibration_images = 16
    DEBUG_MODE = False
    image_size = (64, 64)
    compute_dtype = "float32"


def _save_artifacts(tmp_path):
    from inference_efficient_vision_models_tpu.cli.quantize import _save_qmodel

    spec, params, state = create_model("resnet18", num_classes=6)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (16, 64, 64, 3)).astype(np.uint8)
    eng = QuantizationEngine(_Cfg(), spec, params, state, logging.getLogger("s"))
    qmodel, q_fn = eng.static_quantize((imgs, np.zeros(16, np.int32)))
    dmodel, _ = eng.dynamic_quantize()
    hmodel, _ = eng.cast_half(jnp.float16)
    fold = str(tmp_path / "fold_0")
    _save_qmodel(fold, "static_int8", qmodel, spec=spec)
    _save_qmodel(fold, "dynamic_int8", dmodel, spec=spec)
    _save_qmodel(fold, "fp16", hmodel, spec=spec)
    return fold, imgs, q_fn


def test_predictor_matches_direct_apply(tmp_path):
    fold, imgs, q_fn = _save_artifacts(tmp_path)
    pred = Predictor.from_artifact(fold, "static_int8", batch_size=5)
    test = np.random.default_rng(1).integers(0, 255, (13, 64, 64, 3)).astype(np.uint8)
    logits = pred.predict_logits(test)
    assert logits.shape == (13, 6)
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    direct = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(test))))
    np.testing.assert_allclose(logits, direct, rtol=1e-5, atol=1e-5)
    assert (pred.predict(test) == direct.argmax(1)).all()


def test_predictor_all_artifact_kinds(tmp_path):
    fold, imgs, _ = _save_artifacts(tmp_path)
    test = imgs[:6]
    for method in ("static_int8", "dynamic_int8", "fp16"):
        p = Predictor.from_artifact(fold, method, batch_size=4)
        logits = p.predict_logits(test)
        assert logits.shape == (6, 6) and np.isfinite(logits).all(), method


def test_predictor_mixed_falls_back_to_int8_artifact(tmp_path):
    """method='static_int8_mixed' reuses model_static_int8.msgpack when no
    dedicated file exists and runs the mixed executor over it."""
    import jax

    from inference_efficient_vision_models_tpu.cli.quantize import _save_qmodel
    from inference_efficient_vision_models_tpu.compress.quant import qmobilenet

    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (16, 64, 64, 3)).astype(np.uint8)
    eng = QuantizationEngine(_Cfg(), spec, params, state, logging.getLogger("s"))
    qmodel, _ = eng.static_quantize((imgs, np.zeros(16, np.int32)))
    fold = str(tmp_path / "fold_0")
    _save_qmodel(fold, "static_int8", qmodel, spec=spec)

    p = Predictor.from_artifact(fold, "static_int8_mixed", batch_size=4)
    logits = p.predict_logits(imgs[:4])
    direct = np.asarray(
        jax.jit(lambda q, x: qmobilenet.apply_int8_mixed(spec, q, x))(
            qmodel, jnp.asarray(imgs[:4])
        )
    )
    np.testing.assert_allclose(logits, direct, rtol=1e-5, atol=1e-5)


def test_predictor_bucketed_small_requests(tmp_path):
    """With bucket_sizes, a short request pads to the smallest covering
    bucket — not the full batch — and the logits still match direct apply."""
    fold, imgs, q_fn = _save_artifacts(tmp_path)
    base = Predictor.from_artifact(fold, "static_int8", batch_size=8)
    seen = []

    def recording(x):
        seen.append(x.shape[0])
        return base.apply_fn(x)

    pred = Predictor(
        recording,
        host_preprocess=base.host_preprocess,
        batch_size=8,
        bucket_sizes=(1, 4),
    )
    test = np.random.default_rng(3).integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    logits = pred.predict_logits(test)
    assert seen == [4]  # 3 images → bucket 4, not batch 8
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    direct = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(test))))
    np.testing.assert_allclose(logits, direct, rtol=1e-5, atol=1e-5)

    seen.clear()
    one = pred.predict_logits(test[:1])  # 1 image → the bs-1 program
    assert seen == [1] and one.shape == (1, 6)
    np.testing.assert_allclose(one, direct[:1], rtol=1e-5, atol=1e-5)

    seen.clear()
    full = pred.predict_logits(
        np.random.default_rng(4).integers(0, 255, (13, 64, 64, 3)).astype(np.uint8)
    )
    assert seen == [8, 8] and full.shape == (13, 6)  # 13 → full batch + bucket... tail 5 > 4 → full batch


def test_predictor_bucket_validation_and_warmup(tmp_path):
    import pytest

    fold, _, _ = _save_artifacts(tmp_path)
    with pytest.raises(ValueError):
        Predictor(lambda x: x, batch_size=8, bucket_sizes=(16,))
    pred = Predictor.from_artifact(
        fold, "static_int8", batch_size=8, bucket_sizes=(1, 4)
    )
    pred.warmup(image_shape=(64, 64, 3))  # compiles bs 1/4/8 without error


def test_predictor_stream(tmp_path):
    fold, imgs, _ = _save_artifacts(tmp_path)
    p = Predictor.from_artifact(fold, "static_int8", batch_size=4)
    outs = list(p.predict_stream(iter([imgs[:4], imgs[4:8]])))
    assert len(outs) == 2 and outs[0].shape == (4, 6)


def test_predictor_fused_executor_route(tmp_path, monkeypatch):
    """'static_int8_fused' serves the plain static-int8 artifact through the
    whole-block Pallas executor (interpret mode on CPU)."""
    import dataclasses
    import json
    import logging

    from flax import serialization

    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.serving import Predictor

    import jax

    monkeypatch.setenv("IEVM_FUSED_INTERPRET", "1")

    class Cfg:
        batch_size = 8
        calibration_images = 16
        DEBUG_MODE = False
        image_size = (32, 32)
        compute_dtype = "float32"

    spec, params, state = create_model("mobilenet_v2_050", num_classes=6)
    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8)
    eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
    qmodel, q_fn = eng.static_quantize((imgs, np.zeros(16, np.int32)))
    sd = spec.to_dict() if hasattr(spec, "to_dict") else dataclasses.asdict(spec)
    with open(tmp_path / "spec.json", "w") as f:
        json.dump(sd, f)
    with open(tmp_path / "model_static_int8.msgpack", "wb") as f:
        f.write(serialization.msgpack_serialize(jax.device_get(qmodel)))

    pred = Predictor.from_artifact(str(tmp_path), "static_int8_fused", batch_size=8)
    got = pred.predict_logits(imgs[:8])
    ref = np.asarray(q_fn(jnp.asarray(imgs[:8])))
    np.testing.assert_allclose(got, ref, atol=0.3, rtol=0.02)
