"""MobileNetV2 family: shapes, torch parity, pruning with depthwise coupling,
BN fold + static int8 — the non-ResNet CNN generality proof (reference zoo
handles classifier-head families at `teacher_training/utils.py:21-66`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.models import (
    create_model,
    mobilenet,
    mobilenet_v2_spec,
    spec_from_dict,
)


def test_spec_roundtrip():
    spec = mobilenet_v2_spec(num_classes=6)
    assert spec.stage_widths == (16, 24, 32, 64, 96, 160, 320)
    assert spec.depths == (1, 2, 3, 4, 3, 3, 1)
    assert spec.hidden_widths[0][0] == 32  # t=1 block: hidden == input width
    assert not spec.has_expand[0][0]
    assert spec.has_expand[1][0]
    back = spec_from_dict(spec.to_dict())
    assert back == spec


def test_width_multiplier_variants():
    """timm-style width-multiplier names resolve through the registry with
    torchvision ``width_mult`` rounding (divisible-by-8, last conv scales
    only above 1.0x)."""
    half = mobilenet_v2_spec("mobilenet_v2_050", num_classes=6)
    assert half.stem_width == 16
    assert half.stage_widths == (8, 16, 16, 32, 48, 80, 160)
    assert half.last_width == 1280  # max(1.0, wm) floor
    assert half.hidden_widths[1][0] == 48  # round(8 * 6)
    for s, row in enumerate(half.has_expand):
        for b, e in enumerate(row):
            if not e:
                assert half.hidden_widths[s][b] == half.block_in_width(s, b)

    wide = mobilenet_v2_spec("mobilenet_v2_140", num_classes=6)
    assert wide.stem_width == 48 and wide.last_width == 1792
    assert wide.stage_widths == (24, 32, 48, 88, 136, 224, 448)

    spec, params, state = create_model("mobilenet_v2_050", num_classes=6)
    x = jnp.asarray(np.zeros((1, 32, 32, 3), jnp.float32))
    logits, _ = mobilenet.apply(spec, params, state, x, train=False)
    assert logits.shape == (1, 6)


def test_forward_shapes_and_param_count():
    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    # matches torch mobilenet_v2(num_classes=6) trainable params (1.0x width)
    assert mobilenet.param_count(params) == 2_231_558
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    logits, new_state = mobilenet.apply(spec, params, state, x, train=False)
    assert logits.shape == (2, 6)
    logits_t, st_t = mobilenet.apply(spec, params, state, x, train=True)
    assert logits_t.shape == (2, 6)
    # train mode updated BN running stats
    assert not np.allclose(
        np.asarray(st_t["stem_bn"]["mean"]), np.asarray(state["stem_bn"]["mean"])
    )


def test_torch_parity():
    """Same weights → same logits as the torch oracle (eval mode)."""
    import torch

    from inference_efficient_vision_models_tpu.models.torch_import import (
        from_torch_state_dict_mbv2,
    )
    from tests.torch_ref import mobilenet_v2 as torch_mbv2

    tm = torch_mbv2(num_classes=6).eval()
    # randomize BN stats so the fold isn't trivially identity
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)

    spec = mobilenet_v2_spec(num_classes=6)
    params, state = from_torch_state_dict_mbv2(spec, tm.state_dict())

    x = np.random.default_rng(0).normal(size=(2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got, _ = mobilenet.apply(spec, params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_train_step_runs():
    from inference_efficient_vision_models_tpu.train.steps import make_train_step
    from inference_efficient_vision_models_tpu.train.optim import adamw_init

    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    step = make_train_step(spec, learning_rate=1e-3, compute_dtype="float32")
    rng = np.random.default_rng(0)
    batch = (
        rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8),
        rng.integers(0, 6, 4).astype(np.int32),
        np.ones(4, np.float32),
    )
    p, s, o, m = step(params, state, adamw_init(params), batch)
    assert np.isfinite(float(m["loss"]))


# ----------------------------------------------------------------------------
# structured pruning with the depthwise edge type
# ----------------------------------------------------------------------------


def _forward(spec, params, state, x):
    return np.asarray(
        mobilenet.apply(spec, params, state, jnp.asarray(x), train=False)[0]
    )


def test_zeroed_channel_prune_is_exact_mbv2():
    """Zero channels (producers incl. depthwise kernels + BN affine), prune
    exactly those, require near-identical logits from the smaller model."""
    from inference_efficient_vision_models_tpu.compress.prune.engine import (
        apply_pruning,
    )
    from inference_efficient_vision_models_tpu.compress.prune.graph import (
        get_path,
        group_slices,
        set_path,
    )

    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    params = jax.device_get(params)
    state = jax.device_get(state)
    rng = np.random.default_rng(0)

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
    assert new_spec.hidden_widths != spec.hidden_widths
    # t=1 invariant held through pruning
    assert new_spec.hidden_widths[0][0] == new_spec.stem_width
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_prune_model_shrinks_and_runs_mbv2():
    from inference_efficient_vision_models_tpu.compress.prune import prune_model

    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    n0 = mobilenet.param_count(params)
    new_spec, p2, s2 = prune_model(
        spec, params, state, ratio=0.2, method="l2", round_to=8
    )
    assert mobilenet.param_count(p2) < n0 * 0.85
    for w in new_spec.stage_widths + (new_spec.stem_width, new_spec.last_width):
        assert w % 8 == 0
    for s, row in enumerate(new_spec.hidden_widths):
        for b, w in enumerate(row):
            if new_spec.has_expand[s][b]:
                assert w % 8 == 0
    logits = _forward(new_spec, p2, s2, np.zeros((1, 32, 32, 3), np.float32))
    assert logits.shape == (1, 6)


# ----------------------------------------------------------------------------
# quantization (stage 4) for the mobilenet family
# ----------------------------------------------------------------------------

from inference_efficient_vision_models_tpu.compress.quant import qmobilenet
from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.data.pipeline import normalize_images


class _Cfg:
    batch_size = 16
    calibration_images = 64
    DEBUG_MODE = False
    image_size = (64, 64)
    compute_dtype = "float32"


def test_bn_fold_exact_mbv2():
    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    folded = qmobilenet.fold(spec, params, state)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    ref, _ = mobilenet.apply(spec, params, state, x, train=False)
    got = qmobilenet.apply_folded(spec, folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_u8_stem_fold_exact_mbv2():
    """Normalization folded into the u8 stem matches fp32 normalize+conv
    within int8 weight-quantization error."""
    from inference_efficient_vision_models_tpu.compress.quant import stemfold
    from inference_efficient_vision_models_tpu.compress.quant.observers import (
        ObserverState,
    )

    rng = np.random.default_rng(5)
    w = rng.standard_normal((3, 3, 3, 16)).astype(np.float32) * 0.1
    b = rng.standard_normal(16).astype(np.float32) * 0.1
    obs = ObserverState(0.0, 6.0, True)
    stem = stemfold.make_u8_stem(w, b, obs, stride=2, padding=1, image_size=(32, 32))

    u8 = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    got = np.asarray(
        stemfold.apply_u8_stem(stem, jnp.asarray(u8), stride=2, pad=1, relu6=True)
    )

    import jax.numpy as jnp2
    from jax import lax

    x = normalize_images(jnp.asarray(u8))
    ref = lax.conv_general_dilated(
        x, jnp.asarray(w), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    ref = np.asarray(jnp.minimum(jax.nn.relu(ref), 6.0))
    # bounded by int8 weight-quantization noise accumulated over 27 taps
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_static_int8_close_to_fp32_mbv2():
    import logging

    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    cfg = _Cfg()
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (64, 64, 64, 3)).astype(np.uint8)
    labels = rng.integers(0, 6, 64).astype(np.int32)

    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    assert eng.q is qmobilenet  # family dispatch
    qmodel, q_fn = eng.static_quantize((imgs, labels))

    x = normalize_images(jnp.asarray(imgs[:8]))
    ref = np.asarray(qmobilenet.apply_folded(spec, eng.folded, x))
    got = np.asarray(q_fn(jnp.asarray(imgs[:8])))  # raw u8 in
    err = np.abs(got - ref) / (np.abs(ref).max() + 1e-6)
    assert err.max() < 0.25, err.max()
    agree = (got.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.75, agree

    fp32_mb = eng.size_mb(eng.folded)
    int8_mb = eng.size_mb(qmodel)
    assert int8_mb < fp32_mb / 3.0, (fp32_mb, int8_mb)


def test_static_artifact_roundtrip_mbv2(tmp_path):
    """serializable strips the derived offset map; restore regenerates it
    bit-exactly and the restored model predicts identically."""
    import logging

    from flax import serialization

    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    cfg = _Cfg()
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (32, 64, 64, 3)).astype(np.uint8)
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    qmodel, q_fn = eng.static_quantize((imgs, np.zeros(32, np.int32)))

    ser = qmobilenet.serializable(jax.device_get(qmodel))
    assert "e" not in ser["stem"]
    blob = serialization.to_bytes(ser)
    back = qmobilenet.restore_derived(serialization.msgpack_restore(blob))
    np.testing.assert_array_equal(
        np.asarray(back["stem"]["e"]), np.asarray(qmodel["stem"]["e"])
    )
    got = np.asarray(
        jax.jit(lambda q, x: qmobilenet.apply_int8(spec, q, x))(back, jnp.asarray(imgs[:4]))
    )
    ref = np.asarray(q_fn(jnp.asarray(imgs[:4])))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_static_int8_mixed_close_to_fp32_mbv2():
    """Mixed executor (int8 1×1 convs + bf16 depthwise) runs over the SAME
    static-int8 artifact and tracks fp32 within the full-int8 bounds."""
    import logging

    spec, params, state = create_model("mobilenet_v2", num_classes=6)
    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 255, (64, 64, 64, 3)).astype(np.uint8)
    eng = QuantizationEngine(_Cfg(), spec, params, state, logging.getLogger("q"))
    qmodel, q_fn = eng.static_quantize(
        (imgs, np.zeros(64, np.int32)), executor="mixed"
    )

    x8 = jnp.asarray(imgs[:8])
    ref = np.asarray(qmobilenet.apply_folded(spec, eng.folded, normalize_images(x8)))
    got = np.asarray(q_fn(x8))
    err = np.abs(got - ref) / (np.abs(ref).max() + 1e-6)
    assert err.max() < 0.25, err.max()
    assert (got.argmax(1) == ref.argmax(1)).mean() >= 0.75
    # the engine fn IS the mixed executor (not full int8) over the artifact
    direct = np.asarray(
        jax.jit(lambda q, xx: qmobilenet.apply_int8_mixed(spec, q, xx))(qmodel, x8)
    )
    np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-5)
