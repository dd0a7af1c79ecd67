"""AdaRound (compress/quant/adaround): rectified-sigmoid round-trip, the
conversion-exactness contract (learned rounding survives convert_static_int8
bit-exactly), and objective improvement over nearest rounding."""

import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inference_efficient_vision_models_tpu.compress.quant import qresnet
from inference_efficient_vision_models_tpu.compress.quant.adaround import (
    _argmax_mask,
    _channel_scale,
    adaround_refine,
    init_v,
    rectified_sigmoid,
)
from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.data.pipeline import normalize_images
from inference_efficient_vision_models_tpu.models import create_model


class _Cfg:
    batch_size = 16
    calibration_images = 32
    DEBUG_MODE = False
    image_size = (64, 64)
    observer = "minmax"
    qat_epochs = 0
    adaround_iters = 0


def _calib(n=32, seed=3):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (n, 64, 64, 3)).astype(np.uint8)
    return imgs, rng.integers(0, 6, n).astype(np.int32)


def test_rectified_sigmoid_init_roundtrip():
    frac = np.linspace(0.02, 0.98, 25).astype(np.float32)
    h = np.asarray(rectified_sigmoid(jnp.asarray(init_v(frac))))
    np.testing.assert_allclose(h, frac, atol=1e-5)
    # extremes saturate cleanly inside [0, 1]
    h_ext = np.asarray(rectified_sigmoid(jnp.asarray([-50.0, 50.0])))
    assert h_ext[0] == 0.0 and h_ext[1] == 1.0


def test_argmax_mask_one_per_channel():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    m = _argmax_mask(w, 3)
    assert m.shape == w.shape and m.sum() == 16
    amax = np.abs(w).reshape(-1, 16).max(axis=0)
    # one masked element per channel, and it is that channel's max-|w|
    for c in range(16):
        np.testing.assert_allclose(np.abs(w[..., c][m[..., c]]), [amax[c]])


def test_hardened_rounding_survives_conversion_exactly():
    """The module contract: conversion re-derives each channel scale from the
    hardened weights bit-identically, and re-rounding is the identity on the
    learned grid — the deployed int8 tensors ARE the learned rounding."""
    spec, params, state = create_model("resnet18", num_classes=6)
    cfg = _Cfg()
    imgs, labels = _calib()
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    from inference_efficient_vision_models_tpu.data.pipeline import Batches
    from inference_efficient_vision_models_tpu.compress.quant.observers import (
        quantize_weight_per_channel,
    )

    observers = qresnet.calibrate(
        spec, eng.folded, Batches(imgs, labels, 16), max_images=32
    )
    hardened = adaround_refine(
        spec, qresnet, eng.folded, observers, (imgs, labels), iters=4, batch_size=16
    )

    def walk(orig, hard, top=None):
        if isinstance(orig, dict):
            for k in orig:
                t = k if top is None else top
                if k == "w" and hasattr(orig[k], "ndim") and np.asarray(orig[k]).ndim in (2, 4):
                    yield t, np.asarray(orig[k]), np.asarray(hard[k])
                else:
                    yield from walk(orig[k], hard[k], t)

    checked = 0
    for top, w0, wh in walk(jax.device_get(eng.folded), hardened):
        if top in qresnet.ADAROUND_SKIP:
            # conversion-transformed leaves stay untouched (module doc)
            assert np.array_equal(w0, wh)
            continue
        ax = 3 if w0.ndim == 4 else 1
        s0 = np.asarray(_channel_scale(jnp.asarray(w0), ax))
        sh = np.asarray(_channel_scale(jnp.asarray(wh), ax))
        # (a) scale re-derivation is bit-identical (argmax weight kept)
        assert (s0 == sh).all()
        # (b) every hardened element re-rounds to itself on that scale
        q = np.round(wh / sh)
        keep = _argmax_mask(w0, ax)
        deq = (q * sh).astype(np.float32)
        assert np.array_equal(deq[~keep], wh[~keep])
        assert np.abs(q[~keep]).max() <= 127
        # (c) rounding actually moved somewhere (learned ≠ nearest)
        q_near, _ = quantize_weight_per_channel(w0, channel_axis=ax)
        checked += int((q[~keep] != q_near[~keep]).any())
    assert checked > 0  # at least one layer learned a non-nearest rounding


def test_adaround_improves_calibration_mse():
    """AdaRound's objective — int8-vs-fp32 logit MSE on the calibration
    images — must not be worse than nearest rounding after optimization."""
    spec, params, state = create_model("resnet18", num_classes=6)
    imgs, labels = _calib(48)

    def int8_mse(ada_iters):
        cfg = _Cfg()
        cfg.adaround_iters = ada_iters
        eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
        qmodel, q_fn = eng.static_quantize((imgs, labels))
        got = np.asarray(q_fn(jnp.asarray(imgs)))  # static path takes raw u8
        ref = np.asarray(
            qresnet.apply_folded(spec, eng.folded, normalize_images(jnp.asarray(imgs)))
        )
        return float(np.mean((got - ref) ** 2))

    base = int8_mse(0)
    tuned = int8_mse(40)
    assert np.isfinite(tuned)
    assert tuned <= base * 1.05, (tuned, base)
