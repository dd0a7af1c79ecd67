"""Wide ResNet (base_width=128) through stages 3-4: prune + quantize.

VERDICT r4 item 7: wide_resnet50_2/101_2 entered the zoo as spec + torch
parity only — compression never touched them. These tests run the width
descriptor through the pruning dependency graph (exact-equivalence and
shrink-and-run) and static int8, so the zoo table's "all stages" claim is
test-backed. Wide bottlenecks stress the INNER-width groups differently
from cardinality: inner width = stage_width/2 (vs /4 standard), so the two
inner convs carry most of the parameters and the inner groups dominate the
prune ranking. Reference reach: the open torchvision factory
(`/root/reference/teacher_training/utils.py:32-43`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.compress.prune import (
    group_slices,
    prune_model,
)
from inference_efficient_vision_models_tpu.compress.prune.engine import apply_pruning
from inference_efficient_vision_models_tpu.compress.prune.graph import (
    get_path,
    set_path,
)
from inference_efficient_vision_models_tpu.models import create_model, resnet
from inference_efficient_vision_models_tpu.models.widths import ResNetSpec


def _forward(spec, params, state, x):
    return np.asarray(
        resnet.apply(spec, params, state, jnp.asarray(x), train=False)[0]
    )


def _tiny_wide_spec(num_classes=6):
    """Small wide-bottleneck net: inner = stage/2 (the base_width=128
    parametrization of models/widths.py:125-135), groups=1."""
    return ResNetSpec(
        name="tinywide",
        block="bottleneck",
        depths=(1, 1),
        stage_widths=(32, 64),
        inner_widths=(((16, 16),), ((32, 32),)),
        stem_width=16,
        num_classes=num_classes,
        groups=1,
    )


def test_wide_zeroed_channel_prune_is_exact():
    """Zero channels in stem/inner/stage groups, prune exactly those →
    logits bit-identical. With groups=1 each inner conv prunes as an
    independent group (no lane weld), unlike the ResNeXt case."""
    spec = _tiny_wide_spec()
    params, state = resnet.init(jax.random.PRNGKey(0), spec)
    params = jax.device_get(params)
    state = jax.device_get(state)
    rng = np.random.default_rng(1)

    keep = {}
    for g in group_slices(spec):
        w = g["width"]
        assert int(g.get("lanes", 1)) == 1  # groups=1: no lane structure
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

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ref = _forward(spec, params, state, x)
    new_spec, new_params, new_state = apply_pruning(spec, params, state, keep)
    got = _forward(new_spec, new_params, new_state, x)

    # both inner widths shrank, independently sized (no weld)
    w0, w1 = new_spec.inner_widths[0][0]
    assert w0 < spec.inner_widths[0][0][0]
    assert w1 < spec.inner_widths[0][0][1]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("method", ["l2", "taylor"])
def test_wide_resnet50_2_prune_shrinks_and_runs(method):
    """The real wide_resnet50_2 descriptor (depths trimmed for CPU time)
    through prune_model at the flagship protocol knobs (0.11, round_to=8)."""
    import dataclasses

    from inference_efficient_vision_models_tpu.models.widths import _uniform_inner

    spec, _, _ = create_model("wide_resnet50_2", num_classes=6)
    assert spec.inner_widths[0][0] == (128, 128)  # doubled bottleneck width
    spec = dataclasses.replace(
        spec, depths=(1, 1, 1, 1),
        inner_widths=_uniform_inner("bottleneck", (1, 1, 1, 1), (128, 256, 512, 1024)),
    )
    params, state = resnet.init(jax.random.PRNGKey(2), spec)
    n0 = resnet.param_count(params)
    grads = None
    if method == "taylor":
        from inference_efficient_vision_models_tpu.compress.prune.engine import (
            taylor_grads_accumulated,
        )

        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
        labels = rng.integers(0, 6, 8).astype(np.int32)
        mask = np.ones(8, np.float32)
        grads = taylor_grads_accumulated(
            spec, params, state, [(imgs, labels, mask)]
        )
    new_spec, p2, s2 = prune_model(
        spec, params, state, ratio=0.11, method=method, round_to=8, grads=grads
    )
    n1 = resnet.param_count(p2)
    assert n1 < n0
    # round_to honored on every pruned inner width
    for s, depth in enumerate(new_spec.depths):
        for b in range(depth):
            for w in new_spec.inner_widths[s][b]:
                assert w % 8 == 0, (s, b, w)
    x = np.random.default_rng(4).standard_normal((1, 64, 64, 3)).astype(np.float32)
    out = _forward(new_spec, p2, s2, x)
    assert out.shape == (1, 6)
    assert np.isfinite(out).all()


def test_wide_static_int8_agreement():
    """Stage 4 on a pruned tiny-wide model: per-logit bound + argmax
    agreement (same tolerances as test_resnext.py, justified there)."""
    import logging

    from inference_efficient_vision_models_tpu.compress.quant import qresnet
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images

    class _Cfg:
        batch_size = 8
        calibration_images = 16
        DEBUG_MODE = False
        image_size = (32, 32)
        compute_dtype = "float32"

    spec = _tiny_wide_spec()
    params, state = resnet.init(jax.random.PRNGKey(5), spec)
    # stage 3 first: the quantized model is the PRUNED one (flagship chain)
    pspec, pp, ps = prune_model(params=params, state=state, spec=spec,
                                ratio=0.2, method="l2", round_to=4)
    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8)
    labels = rng.integers(0, 6, 16).astype(np.int32)

    eng = QuantizationEngine(_Cfg(), pspec, pp, ps, logging.getLogger("q"))
    qmodel, q_fn = eng.static_quantize((imgs, labels))

    x = normalize_images(jnp.asarray(imgs[:16]))
    ref = np.asarray(qresnet.apply_folded(pspec, eng.folded, x))
    got = np.asarray(q_fn(jnp.asarray(imgs[:16])))
    err = np.abs(got - ref) / (np.abs(ref).max() + 1e-6)
    assert err.max() < 0.08, err.max()
    assert err.mean() < 0.02, err.mean()
    agree = (got.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.9, agree
