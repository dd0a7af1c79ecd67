"""Structured-pruning correctness tests.

The strongest check is *exact equivalence*: zero out a set of channels
(producer weights + BN affine) so they contribute nothing, prune exactly
those channels, and require bit-identical logits from the re-packed smaller
model. This exercises every coupling edge in the dependency graph (residual
stage groups incl. stem tying and downsample branches, inner convs, fc rows).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.compress.prune import (
    StructuredPruningEngine,
    group_slices,
    prune_model,
)
from inference_efficient_vision_models_tpu.compress.prune.engine import (
    apply_pruning,
    select_channels,
)
from inference_efficient_vision_models_tpu.compress.prune.graph import (
    get_path,
    set_path,
)
from inference_efficient_vision_models_tpu.models import create_model, resnet


def _forward(spec, params, state, x):
    return np.asarray(
        resnet.apply(spec, params, state, jnp.asarray(x), train=False)[0]
    )


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_zeroed_channel_prune_is_exact(name):
    spec, params, state = create_model(name, num_classes=6)
    params = jax.device_get(params)
    state = jax.device_get(state)
    rng = np.random.default_rng(0)

    # choose ~25% of channels per group to kill, zero them, remember keeps
    keep = {}
    for g in group_slices(spec):
        w = g["width"]
        kill = rng.choice(w, size=max(w // 4, 1), replace=False)
        keep[tuple(g["key"])] = np.setdiff1d(np.arange(w), kill)
        for path, axis in g["producers"]:
            arr = np.asarray(get_path(params, path)).copy()
            sl = [slice(None)] * arr.ndim
            sl[axis] = kill
            arr[tuple(sl)] = 0.0
            set_path(params, path, arr)
        for bn_path in g["bns"]:
            bn = get_path(params, bn_path)
            for k in ("scale", "bias"):
                v = np.asarray(bn[k]).copy()
                v[kill] = 0.0
                bn[k] = v

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    ref = _forward(spec, params, state, x)

    new_spec, new_params, new_state = apply_pruning(spec, params, state, keep)
    got = _forward(new_spec, new_params, new_state, x)

    assert new_spec.stage_widths != spec.stage_widths
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("method", ["l1", "l2", "random", "group_norm", "bn_act", "apoz"])
def test_prune_methods_shrink_and_run(method):
    spec, params, state = create_model("resnet18", num_classes=6)
    n0 = resnet.param_count(params)
    new_spec, p2, s2 = prune_model(
        spec, params, state, ratio=0.2, method=method, seed=1
    )
    n1 = resnet.param_count(p2)
    assert n1 < n0 * 0.8  # conv channels pruned on both axes → ≥ ratio shrink
    logits = _forward(new_spec, p2, s2, np.zeros((1, 32, 32, 3), np.float32))
    assert logits.shape == (1, 6)


def test_taylor_importance_runs():
    from inference_efficient_vision_models_tpu.compress.prune.engine import (
        taylor_grads,
    )

    spec, params, state = create_model("resnet18", num_classes=6)
    imgs = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    labels = np.zeros(4, np.int32)
    mask = np.ones(4, np.float32)
    grads = taylor_grads(spec, params, state, (imgs, labels, mask))
    new_spec, p2, s2 = prune_model(
        spec, params, state, ratio=0.1, method="taylor", grads=grads
    )
    assert resnet.param_count(p2) < resnet.param_count(params)


def test_gauss_relu_stats_match_monte_carlo():
    from inference_efficient_vision_models_tpu.compress.prune.importance import (
        _gauss_relu_stats,
    )

    rng = np.random.default_rng(3)
    scale = np.array([0.5, 1.0, 2.0, 0.1])
    bias = np.array([-1.0, 0.0, 1.5, -0.3])
    e_relu, p_nz = _gauss_relu_stats(scale, bias)
    samples = rng.standard_normal((200_000, 4)) * np.abs(scale) + bias
    relu = np.maximum(samples, 0.0)
    np.testing.assert_allclose(e_relu, relu.mean(axis=0), atol=5e-3)
    np.testing.assert_allclose(p_nz, (samples > 0).mean(axis=0), atol=5e-3)


@pytest.mark.parametrize("method", ["bn_act", "apoz"])
def test_activation_importance_kills_dead_channels(method):
    # Channels whose BN affine puts them ~always below zero (dead post-ReLU)
    # must be the ones selected for removal, regardless of weight magnitude.
    spec, params, state = create_model("resnet18", num_classes=6)
    params = jax.device_get(params)

    group = next(g for g in group_slices(spec) if g["key"][0] == "inner")
    width = group["width"]
    dead = np.arange(width // 4)
    for bn_path in group["bns"]:
        bn = get_path(params, bn_path)
        scale = np.full(width, 1.0, np.float32)
        bias = np.full(width, 2.0, np.float32)  # healthy: almost always on
        bias[dead] = -6.0  # dead: P(>0) ≈ Φ(-6) ≈ 0
        bn["scale"], bn["bias"] = scale, bias
        # give dead channels LARGE weights so magnitude criteria would keep them
    for path, axis in group["producers"]:
        arr = np.asarray(get_path(params, path)).copy()
        sl = [slice(None)] * arr.ndim
        sl[axis] = dead
        arr[tuple(sl)] *= 50.0
        set_path(params, path, arr)

    keep = select_channels(spec, params, ratio=0.25, method=method)
    kept = keep[tuple(group["key"])]
    assert not np.intersect1d(kept, dead).size, (
        f"{method} kept dead channels {np.intersect1d(kept, dead)}"
    )
    # sanity: l2 on the same params WOULD keep the boosted dead channels
    keep_l2 = select_channels(spec, params, ratio=0.25, method="l2")
    assert np.intersect1d(keep_l2[tuple(group["key"])], dead).size


def test_iterative_prune_compounds_to_one_shot():
    """K prune steps at (1-R)^(1/K) per-step keep ≈ one-shot prune at R.

    iterative_ft_epochs=0 isolates the width math (no data needed); the
    fine-tune-between-steps path is covered by the pipeline CLI test."""
    import logging

    from inference_efficient_vision_models_tpu.core.config import PruningConfig

    spec, params, state = create_model("resnet18", num_classes=6)
    cfg = PruningConfig(
        pruning_ratio=0.3, iterative_steps=3, iterative_ft_epochs=0,
        pruning_method="l2", round_to=1,
    )
    logger = logging.getLogger("test_iterative")
    engine = StructuredPruningEngine(cfg, spec, params, state, logger)
    engine.prune_iterative(None, None, None)

    _, p_once, _ = prune_model(spec, params, state, ratio=0.3, method="l2")
    n_iter = resnet.param_count(engine.params)
    n_once = resnet.param_count(p_once)
    assert abs(n_iter - n_once) / n_once < 0.05, (n_iter, n_once)
    # widths shrink monotonically vs the unpruned spec
    assert all(
        w_new <= w_old
        for w_new, w_old in zip(engine.spec.stage_widths, spec.stage_widths)
    )


def test_bn_recalibration_restores_eval_mode():
    """After pruning, eval-mode (running-stats) logits diverge from
    train-mode (batch-stats) logits because the running stats are stale;
    recalibrate_bn must close that gap on the calibration distribution."""
    from inference_efficient_vision_models_tpu.models.registry import apply_model
    from inference_efficient_vision_models_tpu.train.bn_recal import recalibrate_bn
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images

    spec, params, state = create_model("resnet18", num_classes=6)
    spec2, p2, s2 = prune_model(spec, params, state, ratio=0.4, method="l2")

    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 256, (128, 64, 64, 3), dtype=np.uint8)
    x = normalize_images(jnp.asarray(imgs))

    ref, _ = apply_model(spec2, p2, s2, x, train=True)  # batch-stats behavior
    stale, _ = apply_model(spec2, p2, s2, x, train=False)
    s3 = recalibrate_bn(spec2, p2, s2, imgs, batch_size=32, num_batches=4)
    recal, _ = apply_model(spec2, p2, s3, x, train=False)

    err_stale = float(jnp.mean((stale - ref) ** 2))
    err_recal = float(jnp.mean((recal - ref) ** 2))
    assert err_recal < err_stale * 0.2, (err_recal, err_stale)


def test_round_to_alignment():
    spec, params, state = create_model("resnet18", num_classes=6)
    new_spec, p2, s2 = prune_model(
        spec, params, state, ratio=0.3, method="l2", round_to=8
    )
    for w in new_spec.stage_widths + (new_spec.stem_width,):
        assert w % 8 == 0
    for stg in new_spec.inner_widths:
        for blk in stg:
            for w in blk:
                assert w % 8 == 0


def test_global_pruning_varies_rates():
    spec, params, state = create_model("resnet18", num_classes=6)
    new_spec, p2, _ = prune_model(
        spec, params, state, ratio=0.2, method="l2", global_pruning=True
    )
    assert resnet.param_count(p2) < resnet.param_count(params)


def test_zero_ratio_identity():
    spec, params, state = create_model("resnet18", num_classes=6)
    new_spec, p2, s2 = prune_model(spec, params, state, ratio=0.0, method="l2")
    assert new_spec == spec
    x = np.random.default_rng(2).standard_normal((1, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        _forward(new_spec, p2, s2, x), _forward(spec, params, state, x), rtol=1e-6
    )


def test_pruned_spec_checkpoint_roundtrip(tmp_path):
    from inference_efficient_vision_models_tpu.core import artifacts
    from inference_efficient_vision_models_tpu.models import ResNetSpec

    spec, params, state = create_model("resnet18", num_classes=6)
    new_spec, p2, s2 = prune_model(spec, params, state, ratio=0.25, method="l2")
    artifacts.save_checkpoint(str(tmp_path), "best", p2, s2, new_spec)
    sd = artifacts.load_spec_dict(str(tmp_path), "best")
    spec_back = ResNetSpec.from_dict(sd)
    assert spec_back == new_spec
    raw = artifacts.load_checkpoint_raw(str(tmp_path), "best")
    x = np.zeros((1, 32, 32, 3), np.float32)
    np.testing.assert_allclose(
        _forward(spec_back, raw["params"], raw["state"], x),
        _forward(new_spec, p2, s2, x),
        rtol=1e-6,
    )
