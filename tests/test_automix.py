"""Automatic mixed-precision policy search (compress/quant/automix.py)."""

import numpy as np

import jax

from tests.test_sensitivity import _engine


def _resnet_engine(n_imgs=16, seed=1):
    from inference_efficient_vision_models_tpu.models import create_model

    with jax.default_device(jax.devices("cpu")[0]):
        spec, params, state = create_model("resnet18", num_classes=6)
    eng = _engine(spec, params, state)
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (n_imgs, 32, 32, 3)).astype(np.uint8)
    labels = rng.integers(0, 6, n_imgs).astype(np.int32)
    return eng, (imgs, labels)


def test_automix_ladder_shape_and_budget():
    eng, data = _resnet_engine()
    eng.cfg.automix_budget = 0.25
    eng.cfg.automix_max_taps = 4
    float_taps, ladder = eng.auto_mixed(data)

    # ladder is a k = 0..stop prefix with consistent fields
    assert [r["k"] for r in ladder] == list(range(len(ladder)))
    for r in ladder:
        assert len(r["float_taps"]) == r["k"]
        assert 0.0 <= r["top1_flips"] <= 1.0
        assert np.isfinite(r["logit_rmse"]) and r["logit_rmse"] >= 0.0
        assert 0.0 <= r["acc"] <= 1.0
    # rung k's float set is the k-prefix of rung k+1's (greedy prefix search)
    for a, b in zip(ladder, ladder[1:]):
        assert set(a["float_taps"]) <= set(b["float_taps"])
    # the chosen set is the last rung's (met budget or hit the cap)
    assert sorted(float_taps) == ladder[-1]["float_taps"]
    if ladder[-1]["top1_flips"] > eng.cfg.automix_budget:
        assert len(ladder) == eng.cfg.automix_max_taps + 1  # cap, not budget


def test_automix_trivial_budget_needs_no_float_taps():
    # flip budget 1.0 is met by the all-int8 configuration: k=0 wins
    eng, data = _resnet_engine(seed=2)
    eng.cfg.automix_budget = 1.0
    float_taps, ladder = eng.auto_mixed(data)
    assert float_taps == [] and len(ladder) == 1 and ladder[0]["k"] == 0


def test_automix_float_taps_reduce_distortion():
    # exempting the top-ranked taps must not increase logit RMSE vs all-int8
    eng, data = _resnet_engine(seed=3)
    eng.cfg.automix_budget = 0.0  # unreachable: walk the full ladder
    eng.cfg.automix_max_taps = 6
    _, ladder = eng.auto_mixed(data)
    assert len(ladder) == 7
    assert ladder[-1]["logit_rmse"] <= ladder[0]["logit_rmse"] + 1e-6
