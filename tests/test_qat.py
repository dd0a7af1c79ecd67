"""Quantization-aware fine-tuning (compress/quant/qat): STE fake-quant
numerics, gradient flow, and the end-to-end static-int8 path with QAT."""

import logging

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.compress.quant import qat
from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.compress.quant.observers import (
    minmax_qparams_affine,
    quantize_weight_per_channel,
)
from inference_efficient_vision_models_tpu.models import create_model


def test_fake_quant_act_matches_affine_roundtrip():
    """Forward of fake_quant_act == dequant(quant(x)) of the real affine op."""
    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 2.0, (512,)).astype(np.float32)
    scale, zp = minmax_qparams_affine(-3.0, 5.0)
    got = np.asarray(qat.fake_quant_act(jnp.asarray(x), scale, zp))
    q = np.clip(np.round(x / scale) + zp, 0, 255)
    want = (q - zp) * scale
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fake_quant_act_ste_gradient():
    """Gradient is identity inside the clip window, zero outside."""
    scale, zp = minmax_qparams_affine(-1.0, 1.0)
    g = jax.grad(lambda x: jnp.sum(qat.fake_quant_act(x, scale, zp)))(
        jnp.asarray([-5.0, -0.5, 0.3, 0.9, 5.0])
    )
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, 1.0, 1.0, 0.0])


def test_fake_quant_weight_matches_conversion():
    """Forward of fake_quant_weight == dequantized quantize_weight_per_channel."""
    rng = np.random.default_rng(1)
    w = rng.normal(0.0, 0.1, (3, 3, 4, 8)).astype(np.float32)
    got = np.asarray(qat.fake_quant_weight(jnp.asarray(w), 3))
    w_q, w_scale = quantize_weight_per_channel(w, channel_axis=3)
    want = w_q.astype(np.float32) * w_scale
    np.testing.assert_allclose(got, want, atol=1e-7)
    # STE: gradient of sum is all-ones through the rounding
    g = jax.grad(lambda v: jnp.sum(qat.fake_quant_weight(v, 3)))(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(g), np.ones_like(w))


def test_fq_weights_structure_preserved():
    """fq_weights touches only 'w' leaves and keeps the pytree structure."""
    spec, params, state = create_model("mobilenet_v2_050", num_classes=6)
    from inference_efficient_vision_models_tpu.compress.quant import qmobilenet

    folded = qmobilenet.fold(spec, params, state)
    fq = qat.fq_weights(jax.tree.map(jnp.asarray, folded))
    assert jax.tree.structure(fq) == jax.tree.structure(
        jax.tree.map(jnp.asarray, folded)
    )
    # biases untouched, weights on-grid (representable in int8 per-channel)
    np.testing.assert_allclose(
        np.asarray(fq["stem"]["b"]), np.asarray(folded["stem"]["b"])
    )
    w = np.asarray(folded["stem"]["w"])
    w_q, w_scale = quantize_weight_per_channel(w, channel_axis=3)
    np.testing.assert_allclose(
        np.asarray(fq["stem"]["w"]), w_q.astype(np.float32) * w_scale, atol=1e-7
    )


class _Cfg:
    batch_size = 16
    calibration_images = 32
    DEBUG_MODE = False
    image_size = (64, 64)
    compute_dtype = "float32"
    observer = "minmax"
    percentile = 99.99
    qat_epochs = 2
    qat_lr = 1e-4


def _toy_data(n=64, seed=7):
    """Linearly-separable-ish synthetic set: class = brightness band."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 6, n).astype(np.int32)
    base = (labels * 40 + 20)[:, None, None, None]
    imgs = np.clip(
        base + rng.normal(0, 12, (n, 64, 64, 3)), 0, 255
    ).astype(np.uint8)
    return imgs, labels


@pytest.mark.parametrize("model", ["efficientnet_b0", "resnet18"])
def test_qat_improves_simulated_int8_loss(model):
    """A few QAT steps reduce the fake-quant CE loss on the train set, and
    the result still converts + runs through the true-int8 path."""
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        quant_module,
        s2d_preprocess,
    )
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images
    from inference_efficient_vision_models_tpu.models.widths import ResNetSpec
    from inference_efficient_vision_models_tpu.train.losses import cross_entropy

    spec, params, state = create_model(model, num_classes=6)
    imgs, labels = _toy_data()
    qmod = quant_module(spec)
    folded0 = qmod.fold(spec, params, state)

    from inference_efficient_vision_models_tpu.data.pipeline import Batches

    observers = qmod.calibrate(
        spec, folded0, Batches(imgs, labels, 16), max_images=32
    )
    fq_params = {
        n: minmax_qparams_affine(o.min, o.max) for n, o in observers.items()
    }

    def tap_fn(name, t):
        if name == "input":
            return t
        s, zp = fq_params[name]
        return qat.fake_quant_act(t, s, zp)

    def fq_loss(folded):
        f = jax.tree.map(jnp.asarray, folded)
        logits = qmod.apply_folded(
            spec, qat.fq_weights(f), normalize_images(jnp.asarray(imgs)),
            tap_fn=tap_fn,
        )
        return float(cross_entropy(logits, jnp.asarray(labels)))

    loss0 = fq_loss(folded0)
    folded1 = qat.qat_finetune(
        spec, qmod, folded0, observers, (imgs, labels),
        epochs=2, lr=1e-3, batch_size=16,
    )
    loss1 = fq_loss(folded1)
    assert loss1 < loss0, (loss0, loss1)

    # end-to-end: conversion of the QAT'd weights still runs true int8
    qmodel = qmod.convert_static_int8(spec, folded1, observers, image_size=(64, 64))
    x = imgs[:8]
    if isinstance(spec, ResNetSpec):
        x = s2d_preprocess(x)
    out = np.asarray(qmod.apply_int8(spec, jax.tree.map(jnp.asarray, qmodel), jnp.asarray(x)))
    assert np.isfinite(out).all()


def test_engine_qat_path():
    """QuantizationEngine.static_quantize with qat_epochs runs QAT and the
    returned int8 forward is at least as accurate as pure PTQ on train."""
    imgs, labels = _toy_data(48, seed=11)
    spec, params, state = create_model("mobilenet_v2_050", num_classes=6)

    cfg = _Cfg()
    cfg.qat_epochs = 0
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    _, fn_ptq = eng.static_quantize((imgs, labels))

    cfg2 = _Cfg()
    eng2 = QuantizationEngine(cfg2, spec, params, state, logging.getLogger("q"))
    _, fn_qat = eng2.static_quantize((imgs, labels), train_data=(imgs, labels))

    x = jnp.asarray(imgs)
    acc_ptq = float((np.asarray(fn_ptq(x)).argmax(1) == labels).mean())
    acc_qat = float((np.asarray(fn_qat(x)).argmax(1) == labels).mean())
    assert acc_qat >= acc_ptq - 1e-9, (acc_ptq, acc_qat)


def test_fake_quant_weight_int4_matches_conversion():
    """Forward of fake_quant_weight_int4 == wo4 pack→unpack round trip, for
    a grouped reduction (r divisible) and a prime-ish one (single group)."""
    from inference_efficient_vision_models_tpu.compress.quant import wo4

    rng = np.random.default_rng(2)
    for shape in ((3, 3, 16, 8), (3, 3, 3, 8), (128, 6)):
        w = rng.normal(0.0, 0.1, shape).astype(np.float32)
        got = np.asarray(qat.fake_quant_weight_int4(jnp.asarray(w)))
        want = np.asarray(
            wo4._unpack_scale(wo4.quantize_weight_int4(w), jnp.float32)
        )
        np.testing.assert_allclose(got, want, atol=1e-6)
    # STE: gradient of sum is all-ones through the group round/clip
    g = jax.grad(lambda v: jnp.sum(qat.fake_quant_weight_int4(v)))(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(g), np.ones_like(w))


def test_fq_weights_w4_mirrors_policy():
    """fq_weights_w4 keeps the pytree structure and routes exactly the
    leaves wo4's keep_int8 policy keeps int8 onto the int8 grid."""
    from inference_efficient_vision_models_tpu.compress.quant import (
        qeffnet,
        wo4,
    )

    spec, params, state = create_model("efficientnet_b0", num_classes=6)
    folded = jax.tree.map(jnp.asarray, qeffnet.fold(spec, params, state))
    fq = qat.fq_weights_w4(folded)
    assert jax.tree.structure(fq) == jax.tree.structure(folded)
    # stem (reduction 27 < 32) is an int8-policy leaf: per-channel int8 grid
    w = np.asarray(folded["stem"]["w"])
    assert wo4._keep_int8_auto(("stem", "w"), w)
    w_q, w_scale = quantize_weight_per_channel(w, channel_axis=3)
    np.testing.assert_allclose(
        np.asarray(fq["stem"]["w"]), w_q.astype(np.float32) * w_scale, atol=1e-7
    )
    # the classifier matrix is an int4 leaf: matches the wo4 grid
    w = np.asarray(folded["fc"]["w"])
    assert not wo4._keep_int8_auto(("fc", "w"), w)
    want = np.asarray(wo4._unpack_scale(wo4.quantize_weight_int4(w), jnp.float32))
    np.testing.assert_allclose(np.asarray(fq["fc"]["w"]), want, atol=1e-6)


def test_engine_w4_qat_path():
    """weight_only_quantize(bits=4) with qat_epochs runs W4 QAT; the result
    is at least as train-accurate as PTQ-only W4 and still a W4 artifact."""
    from inference_efficient_vision_models_tpu.compress.quant import wo4

    imgs, labels = _toy_data(48, seed=13)
    spec, params, state = create_model("mobilenet_v2_050", num_classes=6)

    cfg = _Cfg()
    cfg.qat_epochs = 0
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    m_ptq, fn_ptq = eng.weight_only_quantize(bits=4)

    cfg2 = _Cfg()
    eng2 = QuantizationEngine(cfg2, spec, params, state, logging.getLogger("q"))
    m_qat, fn_qat = eng2.weight_only_quantize(bits=4, train_data=(imgs, labels))
    assert wo4.is_weight_only_int4(m_qat)

    x = jnp.asarray(imgs)
    acc_ptq = float((np.asarray(fn_ptq(x)).argmax(1) == labels).mean())
    acc_qat = float((np.asarray(fn_qat(x)).argmax(1) == labels).mean())
    assert acc_qat >= acc_ptq - 1e-9, (acc_ptq, acc_qat)


def test_engine_w8_qat_path():
    """weight_only_quantize(bits=8) with qat_epochs runs QAT against the
    per-channel int8 grid (fq_weights — the exact wo8 conversion grid); the
    result is still a W8 artifact and at least as train-accurate as PTQ."""
    from inference_efficient_vision_models_tpu.compress.quant import wo8

    imgs, labels = _toy_data(48, seed=17)
    spec, params, state = create_model("mobilenet_v2_050", num_classes=6)

    cfg = _Cfg()
    cfg.qat_epochs = 0
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    m_ptq, fn_ptq = eng.weight_only_quantize()

    cfg2 = _Cfg()
    eng2 = QuantizationEngine(cfg2, spec, params, state, logging.getLogger("q"))
    m_qat, fn_qat = eng2.weight_only_quantize(train_data=(imgs, labels))
    assert wo8.is_weight_only(m_qat)
    # QAT actually moved the stored int8 weights (it ran, not a no-op)
    assert not np.array_equal(
        np.asarray(jax.device_get(m_ptq["stem"]["w"]["q"])),
        np.asarray(jax.device_get(m_qat["stem"]["w"]["q"])),
    )

    x = jnp.asarray(imgs)
    acc_ptq = float((np.asarray(fn_ptq(x)).argmax(1) == labels).mean())
    acc_qat = float((np.asarray(fn_qat(x)).argmax(1) == labels).mean())
    assert acc_qat >= acc_ptq - 1e-9, (acc_ptq, acc_qat)
