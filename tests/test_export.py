"""AOT deployment export (export.py): stage-4 artifact → serialized
StableHLO container → deserialize → numerically identical logits."""

import json
import logging
import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

from inference_efficient_vision_models_tpu.compress.quant import qresnet
from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.export import (
    load_exported,
    read_header,
    s2d_layout,
    save_exported,
)
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.serving import load_quantized


class _Cfg:
    batch_size = 8
    calibration_images = 16
    DEBUG_MODE = False
    image_size = (64, 64)
    observer = "minmax"


def _make_artifact(tmp_path, model_name, method):
    spec, params, state = create_model(model_name, num_classes=6)
    eng = QuantizationEngine(_Cfg(), spec, params, state, logging.getLogger("q"))
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (16, 64, 64, 3)).astype(np.uint8)
    if method == "static_int8":
        model, _fn = eng.static_quantize((imgs, np.zeros(16, np.int32)))
        model = eng.q.serializable(model)
    else:
        model, _fn = eng.weight_only_quantize()
    with open(os.path.join(tmp_path, f"model_{method}.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(model)))
    with open(os.path.join(tmp_path, "spec.json"), "w") as f:
        json.dump(spec.to_dict(), f)
    return imgs


def test_export_static_int8_s2d_layout(tmp_path):
    fold = str(tmp_path)
    imgs = _make_artifact(fold, "resnet18", "static_int8")
    out = os.path.join(fold, "resnet18_static.ievm")
    header = save_exported(
        fold, "static_int8", out,
        batch_size=8, image_size=(64, 64), platforms=("cpu",),
    )
    assert header["input_layout"] == "s2d"
    assert header["input_shape"] == [8, 32, 32, 12]
    assert read_header(out) == header

    call, hdr2 = load_exported(out)
    x = s2d_layout(imgs[:8])
    got = call(x)
    _, _, fn, pre = load_quantized(fold, "static_int8")
    assert pre is not None  # serving applies the same s2d host transform
    ref = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert got.dtype == np.float32 and got.shape == (8, 6)


def test_export_weight_only_nhwc_layout(tmp_path):
    fold = str(tmp_path)
    imgs = _make_artifact(fold, "mobilenet_v2", "weight_only_int8")
    out = os.path.join(fold, "mbv2_wo8.ievm")
    header = save_exported(
        fold, "weight_only_int8", out,
        batch_size=4, image_size=(64, 64), platforms=("cpu",),
    )
    assert header["input_layout"] == "nhwc"
    call, _ = load_exported(out)
    got = call(imgs[:4])
    _, _, fn, pre = load_quantized(fold, "weight_only_int8")
    assert pre is None
    ref = np.asarray(fn(jnp.asarray(imgs[:4])))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_export_rejects_garbage(tmp_path):
    p = os.path.join(str(tmp_path), "x.ievm")
    with open(p, "wb") as f:
        f.write(b"NOPEnope")
    try:
        read_header(p)
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_export_static_int8_device_preprocess_nhwc(tmp_path):
    """device_preprocess=True traces the relayout into the program: the
    static-int8 ResNet export consumes plain NHWC uint8 and matches the
    s2d-fed serving path exactly (same program after the relayout)."""
    fold = str(tmp_path)
    imgs = _make_artifact(fold, "resnet18", "static_int8")
    out = os.path.join(fold, "resnet18_static_nhwc.ievm")
    header = save_exported(
        fold, "static_int8", out,
        batch_size=8, image_size=(64, 64), platforms=("cpu",),
        device_preprocess=True,
    )
    assert header["input_layout"] == "nhwc"
    assert header["input_shape"] == [8, 64, 64, 3]
    call, _ = load_exported(out)
    got = call(imgs[:8])
    _, _, fn, _pre = load_quantized(fold, "static_int8")
    ref = np.asarray(fn(jnp.asarray(s2d_layout(imgs[:8]))))
    np.testing.assert_array_equal(got, ref)
