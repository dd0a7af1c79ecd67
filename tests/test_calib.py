"""Calibration observer menu (compress/quant/calib): percentile and
entropy/KL range estimators beside the reference-parity minmax EMA."""

import logging

import numpy as np
import pytest
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.compress.quant import qresnet
from inference_efficient_vision_models_tpu.compress.quant.calib import (
    calibrate_taps,
    entropy_range,
    percentile_range,
)
from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.models import create_model


def _outlier_hist(bins=2048, lo=0.0, hi=100.0):
    """Gaussian bulk in [0, 10] + a single extreme outlier at the top bin."""
    rng = np.random.default_rng(0)
    bulk = np.clip(rng.normal(5.0, 1.5, 100_000), lo, hi)
    hist, _ = np.histogram(bulk, bins=bins, range=(lo, hi))
    hist[-1] += 3  # three samples at ~100: 0.003% of the mass
    return hist


def test_percentile_clips_outliers():
    hist = _outlier_hist()
    lo, hi = percentile_range(hist, 0.0, 100.0, pct=99.99)
    # the 99.99% window keeps the bulk but cuts the extreme tail
    assert hi < 20.0, hi
    assert lo <= 1.0
    # pct=100 degenerates to the full range
    lo_f, hi_f = percentile_range(hist, 0.0, 100.0, pct=100.0)
    assert hi_f == pytest.approx(100.0)


def test_entropy_range_clips_outliers_keeps_bulk():
    hist = _outlier_hist()
    lo, hi = entropy_range(hist, 0.0, 100.0)
    assert hi < 50.0, hi  # outlier tail cut
    assert hi > 9.0, hi  # bulk (mean 5, sigma 1.5) retained


def test_entropy_spike_plus_heavy_tail_keeps_tail():
    """Regression: with KL folded into the edge bins of BOTH p and q
    (classic TensorRT formulation), clipping is free in the objective, so on
    spike-plus-heavy-tail activations (EfficientNet SiLU) the narrowest
    candidate window won and saturated the whole informative tail — measured
    36% vs 90% fp32 on the ef2 5-fold run. The full-support KL must keep
    ≈all of the tail."""
    rng = np.random.default_rng(0)
    spike = np.abs(rng.normal(0, 0.05, 970_000))
    tail = rng.exponential(1.5, 30_000)
    x = np.concatenate([spike, tail])
    hist, _ = np.histogram(x, bins=2048, range=(0.0, 12.0))
    lo, hi = entropy_range(hist, 0.0, 12.0)
    clipped_frac = float((x > hi).mean())
    assert clipped_frac < 2e-3, (hi, clipped_frac)  # was 0.5% pre-fix (hi≈2.7)
    assert hi > 4.0, hi


def test_degenerate_histograms():
    z = np.zeros(128, np.int64)
    assert percentile_range(z, -1.0, 1.0) == (-1.0, 1.0)
    assert entropy_range(z, -1.0, 1.0) == (-1.0, 1.0)


class _Cfg:
    batch_size = 16
    calibration_images = 32
    DEBUG_MODE = False
    image_size = (64, 64)
    compute_dtype = "float32"
    observer = "minmax"
    percentile = 99.99


def _calib_images(n=32):
    rng = np.random.default_rng(3)
    return rng.integers(0, 255, (n, 64, 64, 3)).astype(np.uint8)


@pytest.mark.parametrize("observer", ["percentile", "entropy"])
def test_static_int8_with_observer_menu(observer):
    """End-to-end static int8 through each estimator: finite logits whose
    argmax tracks the folded fp32 forward."""
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images

    spec, params, state = create_model("resnet18", num_classes=6)
    cfg = _Cfg()
    cfg.observer = observer
    imgs = _calib_images()
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    qmodel, q_fn = eng.static_quantize((imgs, np.zeros(len(imgs), np.int32)))
    got = np.asarray(q_fn(jnp.asarray(imgs[:8])))
    assert np.isfinite(got).all()
    ref = np.asarray(
        qresnet.apply_folded(spec, eng.folded, normalize_images(jnp.asarray(imgs[:8])))
    )
    assert (got.argmax(1) == ref.argmax(1)).mean() >= 0.75


def test_histogram_ranges_subset_of_minmax_support():
    """Percentile clip windows are contained in the global activation
    support; with pct≈100 they recover it."""
    spec, params, state = create_model("resnet18", num_classes=6)
    imgs = _calib_images()
    folded = qresnet.fold(spec, params, state)
    from inference_efficient_vision_models_tpu.data.pipeline import Batches

    loader = Batches(imgs, np.zeros(len(imgs), np.int32), 16)
    full = calibrate_taps(
        qresnet.apply_folded, spec, folded, loader,
        max_images=32, observer="percentile", percentile=100.0,
    )
    clipped = calibrate_taps(
        qresnet.apply_folded, spec, folded, loader,
        max_images=32, observer="percentile", percentile=99.0,
    )
    assert set(full) == set(clipped)
    narrower = 0
    for name in full:
        assert clipped[name].min >= full[name].min - 1e-5
        assert clipped[name].max <= full[name].max + 1e-5
        if (clipped[name].max - clipped[name].min) < 0.999 * (
            full[name].max - full[name].min
        ):
            narrower += 1
    assert narrower > 0  # 99% clipping actually tightened some taps
