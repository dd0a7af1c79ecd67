"""Quantization tests: observer parity vs torch.ao, BN-fold exactness,
quant/dequant round-trips, and static/dynamic int8 end-to-end behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.compress.quant import qresnet
from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.compress.quant.fold import fold_conv_bn
from inference_efficient_vision_models_tpu.compress.quant.observers import (
    ObserverState,
    minmax_qparams_affine,
    quantize_weight_per_channel,
)
from inference_efficient_vision_models_tpu.models import create_model, resnet


def test_affine_qparams_match_torch():
    torch = pytest.importorskip("torch")
    from torch.ao.quantization.observer import MovingAverageMinMaxObserver

    rng = np.random.default_rng(0)
    obs_t = MovingAverageMinMaxObserver(
        averaging_constant=0.01, dtype=torch.quint8,
        qscheme=torch.per_tensor_affine,
    )
    obs_j = ObserverState.fresh()
    for _ in range(5):
        x = rng.standard_normal((64,)).astype(np.float32) * rng.uniform(0.5, 3)
        obs_t(torch.tensor(x))
        obs_j = obs_j.update(x.min(), x.max(), 0.01)
    scale_t, zp_t = obs_t.calculate_qparams()
    scale_j, zp_j = minmax_qparams_affine(obs_j.min, obs_j.max)
    np.testing.assert_allclose(scale_j, float(scale_t), rtol=1e-6)
    assert zp_j == int(zp_t)


def test_per_channel_weight_quant_matches_torch():
    torch = pytest.importorskip("torch")
    from torch.ao.quantization.observer import PerChannelMinMaxObserver

    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 3, 3, 16)).astype(np.float32)  # HWIO-ish
    # torch observer works on OIHW with ch_axis=0 → give it O-major view
    w_oihw = np.transpose(w, (3, 2, 0, 1))
    obs = PerChannelMinMaxObserver(
        ch_axis=0, dtype=torch.qint8, qscheme=torch.per_channel_symmetric
    )
    obs(torch.tensor(w_oihw))
    scale_t, _ = obs.calculate_qparams()

    w_q, scale_j = quantize_weight_per_channel(w, channel_axis=3)
    np.testing.assert_allclose(scale_j, scale_t.numpy(), rtol=1e-5)
    # round-trip error bounded by scale/2
    deq = w_q.astype(np.float32) * scale_j.reshape(1, 1, 1, -1)
    assert np.max(np.abs(deq - w)) <= np.max(scale_j) * 0.5 + 1e-6


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_bn_fold_exact(name):
    spec, params, state = create_model(name, num_classes=6)
    folded = fold_conv_bn(spec, params, state)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    ref, _ = resnet.apply(spec, params, state, x, train=False)
    got = qresnet.apply_folded(spec, folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def _trained_like_model(seed=0):
    """Random-init model; activations are still representative for numerics."""
    spec, params, state = create_model("resnet18", num_classes=6)
    return spec, params, state


class _Cfg:
    batch_size = 16
    calibration_images = 64
    DEBUG_MODE = False
    image_size = (64, 64)
    compute_dtype = "float32"


def test_static_int8_close_to_fp32():
    import logging

    spec, params, state = _trained_like_model()
    cfg = _Cfg()
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (64, 64, 64, 3)).astype(np.uint8)
    labels = rng.integers(0, 6, 64).astype(np.int32)

    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    qmodel, q_fn = eng.static_quantize((imgs, labels))

    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images

    x = normalize_images(jnp.asarray(imgs[:8]))
    ref = np.asarray(qresnet.apply_folded(spec, eng.folded, x))
    got = np.asarray(q_fn(jnp.asarray(imgs[:8])))  # static path takes raw u8
    # int8 logits track fp32 within quantization noise; argmax mostly agrees
    err = np.abs(got - ref) / (np.abs(ref).max() + 1e-6)
    assert err.max() < 0.25, err.max()
    agree = (got.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.75, agree

    # int8 model serializes ~4x smaller than fp32 params
    fp32_mb = eng.size_mb(eng.folded)
    int8_mb = eng.size_mb(qmodel)
    assert int8_mb < fp32_mb / 3.0, (fp32_mb, int8_mb)


def test_dynamic_int8_fc_close_to_fp32():
    import logging

    spec, params, state = _trained_like_model()
    cfg = _Cfg()
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    model, fn = eng.dynamic_quantize()
    imgs = np.random.default_rng(4).integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images

    ref = np.asarray(
        qresnet.apply_folded(spec, eng.folded, normalize_images(jnp.asarray(imgs)))
    )
    got = np.asarray(fn(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.05)


def test_fp16_cast_close_and_half_size():
    import logging

    spec, params, state = _trained_like_model()
    cfg = _Cfg()
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    model, fn = eng.cast_half(jnp.float16)
    imgs = np.random.default_rng(5).integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images

    ref = np.asarray(
        qresnet.apply_folded(spec, eng.folded, normalize_images(jnp.asarray(imgs)))
    )
    got = np.asarray(fn(jnp.asarray(imgs)))
    assert np.max(np.abs(got - ref)) < 0.1
    assert eng.size_mb(model) < eng.size_mb(eng.folded) * 0.55


def test_quantized_pruned_model_runs():
    """Stage-3 → stage-4 chaining: quantize a pruned-width model."""
    import logging

    from inference_efficient_vision_models_tpu.compress.prune import prune_model

    spec, params, state = create_model("resnet18", num_classes=6)
    pspec, pparams, pstate = prune_model(spec, params, state, ratio=0.25, method="l2", round_to=8)
    cfg = _Cfg()
    eng = QuantizationEngine(cfg, pspec, pparams, pstate, logging.getLogger("q"))
    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 255, (32, 64, 64, 3)).astype(np.uint8)
    qmodel, q_fn = eng.static_quantize((imgs, np.zeros(32, np.int32)))

    logits = np.asarray(q_fn(jnp.asarray(imgs[:4])))
    assert logits.shape == (4, 6)
    assert np.isfinite(logits).all()


def test_static_artifact_roundtrip_strips_derived():
    """Serialized static-int8 artifact excludes derived offset maps and
    restores to identical logits after regeneration."""
    import logging

    from flax import serialization

    spec, params, state = _trained_like_model()
    cfg = _Cfg()
    rng = np.random.default_rng(8)
    imgs = rng.integers(0, 255, (16, 64, 64, 3)).astype(np.uint8)
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    qmodel, q_fn = eng.static_quantize((imgs, np.zeros(16, np.int32)))

    blob = serialization.to_bytes(jax.device_get(qresnet.serializable(qmodel)))
    restored = qresnet.restore_derived(serialization.msgpack_restore(blob))
    assert "e" in restored["stem"] and "e4" in restored["stem"]
    np.testing.assert_allclose(
        np.asarray(restored["stem"]["e"]), np.asarray(qmodel["stem"]["e"]),
        rtol=1e-5, atol=1e-5,
    )
    x = jnp.asarray(imgs[:4])
    a = np.asarray(qresnet.apply_int8(spec, restored, x))
    b = np.asarray(q_fn(x))
    # jitted vs op-by-op execution: same math, fp fusion differences only
    np.testing.assert_allclose(a, b, rtol=0.02, atol=0.02)
    assert (a.argmax(1) == b.argmax(1)).all()
    # stripped artifact is ~int8-sized: much smaller than with offsets
    assert len(blob) < eng.size_mb(eng.folded) * 1e6 / 3.0


# ----------------------------------------------------------------------------
# weight-only int8 (W8A16) — TPU-native serving mode
# ----------------------------------------------------------------------------


@pytest.mark.parametrize(
    "model_name", ["resnet18", "mobilenet_v2", "efficientnet_b0", "vit"]
)
def test_weight_only_int8_close_and_roundtrips(model_name, tmp_path):
    """W8A16 (compress/quant/wo8): int8 per-channel weights + bf16 compute
    track the folded fp32 forward; the artifact round-trips msgpack and the
    serving loader auto-detects it."""
    import logging
    import json
    import os

    from flax import serialization

    from inference_efficient_vision_models_tpu.compress.quant import wo8
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.serving import load_quantized

    class Cfg:
        batch_size = 8
        calibration_images = 16
        DEBUG_MODE = False
        image_size = (64, 64)
        compute_dtype = "float32"

    if model_name == "vit":
        from inference_efficient_vision_models_tpu.models.vit import ViTSpec

        spec = ViTSpec(
            name="vit_test", patch=8, dim=64, depth=2, heads=2, mlp_ratio=2.0,
            num_classes=6, image_size=64,
        )
        spec, params, state = create_model(spec, num_classes=6)
    else:
        spec, params, state = create_model(model_name, num_classes=6)
    eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
    model, fn = eng.weight_only_quantize()
    assert wo8.is_weight_only(model)

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (8, 64, 64, 3)).astype(np.uint8)
    got = np.asarray(fn(jnp.asarray(imgs)))
    ref = np.asarray(
        jax.jit(
            lambda m, x: eng.q.apply_folded(spec, m, normalize_images(x))
        )(eng.folded, jnp.asarray(imgs))
    )
    assert (got.argmax(1) == ref.argmax(1)).mean() >= 0.75
    # ~3.9x smaller weights than the fp32 folded model
    assert eng.size_mb(model) < eng.size_mb(eng.folded) / 3.0

    fold_dir = str(tmp_path)
    with open(os.path.join(fold_dir, "model_weight_only_int8.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(model)))
    with open(os.path.join(fold_dir, "spec.json"), "w") as f:
        json.dump(spec.to_dict(), f)
    spec2, model2, fn2, pre = load_quantized(fold_dir, "weight_only_int8")
    assert pre is None
    # the serving loader runs the s2d-folded uint8 stem (exact algebra; only
    # bf16 reassociation differs — see test_u8_folded_forward_* for the fp32
    # equivalence) so logits track within bf16 noise and argmax agrees
    served = np.asarray(fn2(jnp.asarray(imgs)))
    assert (served.argmax(1) == got.argmax(1)).mean() >= 0.875
    np.testing.assert_allclose(served, got, rtol=0.1, atol=0.1)


# ----------------------------------------------------------------------------
# weight-only int4 (W4A16) — packed nibbles, group-wise scales
# ----------------------------------------------------------------------------


def test_wo4_pack_unpack_exact():
    """The nibble pack/unpack is lossless over the full int4 range and the
    group-scale dequant error is bounded by half a quantization step."""
    from inference_efficient_vision_models_tpu.compress.quant import wo4

    rng = np.random.default_rng(0)
    for shape in [(3, 3, 3, 32), (3, 3, 1, 32), (1, 1, 96, 24), (1280, 6), (7, 64)]:
        w = rng.normal(0, 0.5, shape).astype(np.float32)
        leaf = wo4.quantize_weight_int4(w)
        assert leaf["q4"].shape == shape[:-1] + (shape[-1] // 2,)
        r = int(np.prod(shape[:-1]))
        g = r // leaf["s"].shape[0]
        assert r % leaf["s"].shape[0] == 0 and 1 <= g <= 64
        w_hat = np.asarray(wo4._unpack_scale(leaf, jnp.float32))
        assert w_hat.shape == w.shape
        # per-element error <= s/2 for its (group, channel) scale
        s_full = np.repeat(leaf["s"], g, axis=0).reshape(shape)
        assert np.all(np.abs(w_hat - w) <= s_full / 2 + 1e-7)
        # packed ints survive exactly: re-quantizing w_hat gives same nibbles
        again = wo4.quantize_weight_int4(w_hat)
        np.testing.assert_array_equal(again["q4"], leaf["q4"])


def _iter_wpaths(tree, path=()):
    """Yield (path, array) for every quantizable 'w' leaf (ndim>=2 float32)."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == "w" and not isinstance(v, dict):
                a = np.asarray(v)
                if a.ndim >= 2 and a.dtype == np.float32:
                    yield path + (k,), a
                    continue
            yield from _iter_wpaths(v, path + (str(k),))


def test_wo4_odd_out_falls_back_to_int8():
    from inference_efficient_vision_models_tpu.compress.quant import wo4

    # reduction axis >= 32 so the automatic int8 policy (_keep_int8_auto:
    # depthwise / tiny-reduction kernels stay int8) does not trigger —
    # "a" falls back because its OUT dim is odd (can't pack two nibbles),
    # "b" genuinely packs int4.
    folded = {"a": {"w": np.ones((64, 3), np.float32)},  # odd out -> int8 leaf
              "b": {"w": np.ones((64, 8), np.float32)}}
    m = wo4.convert_weight_only_int4(folded)
    assert set(m["a"]["w"].keys()) == {"q", "s"}
    assert set(m["b"]["w"].keys()) == {"q4", "s"}
    deq = wo4.dequantize(m, jnp.float32)
    # int8 fallback scale is max|w|/127.5, so 1.0 -> 127/127.5 (half-step err)
    np.testing.assert_allclose(np.asarray(deq["a"]["w"]), folded["a"]["w"], atol=1 / 127)
    np.testing.assert_allclose(np.asarray(deq["b"]["w"]), folded["b"]["w"], atol=1e-6)
    # the tiny-reduction policy leaf itself: reduction < 32 stays int8 even
    # with an even OUT dim
    tiny = wo4.convert_weight_only_int4({"c": {"w": np.ones((4, 8), np.float32)}})
    assert set(tiny["c"]["w"].keys()) == {"q", "s"}


@pytest.mark.parametrize("model_name", ["resnet18", "efficientnet_b0"])
def test_weight_only_int4_close_and_roundtrips(model_name, tmp_path):
    """W4A16 (compress/quant/wo4): packed-int4 group-scaled weights + bf16
    compute track the folded fp32 forward; ~7x smaller than fp32; artifact
    round-trips msgpack and the serving loader auto-detects it."""
    import logging
    import json
    import os

    from flax import serialization

    from inference_efficient_vision_models_tpu.compress.quant import wo4
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images
    from inference_efficient_vision_models_tpu.serving import load_quantized

    class Cfg:
        batch_size = 8
        calibration_images = 16
        DEBUG_MODE = False
        image_size = (64, 64)
        compute_dtype = "float32"

    spec, params, state = create_model(model_name, num_classes=6)
    eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
    model, fn = eng.weight_only_quantize(bits=4)
    assert wo4.is_weight_only_int4(model)

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (8, 64, 64, 3)).astype(np.uint8)
    got = np.asarray(fn(jnp.asarray(imgs)))
    ref = np.asarray(
        jax.jit(
            lambda m, x: eng.q.apply_folded(spec, m, normalize_images(x))
        )(eng.folded, jnp.asarray(imgs))
    )
    if model_name == "resnet18":
        # random-init EffNet logits have ~4e-5 std (deep sigmoid-SE squash),
        # so argmax agreement is meaningless noise there; check it on ResNet
        assert (got.argmax(1) == ref.argmax(1)).mean() >= 0.75
    # every dequantized weight is within half an int4 step of its fp32 value
    deq = jax.device_get(wo4.dequantize(model, jnp.float32))
    flat_f = {"/".join(p): v for p, v in _iter_wpaths(jax.device_get(eng.folded))}
    for path, v in _iter_wpaths(deq):
        w = flat_f["/".join(path)]
        step = np.abs(w).max() / 7.0 if w.size else 0.0
        assert np.abs(v - w).max() <= step / 2 + 1e-6, path
    # ~7x smaller weights than the fp32 folded model (int4 + 6% scales)
    assert eng.size_mb(model) < eng.size_mb(eng.folded) / 5.0

    fold_dir = str(tmp_path)
    with open(os.path.join(fold_dir, "model_weight_only_int4.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(model)))
    with open(os.path.join(fold_dir, "spec.json"), "w") as f:
        json.dump(spec.to_dict(), f)
    spec2, model2, fn2, pre = load_quantized(fold_dir, "weight_only_int4")
    assert pre is None
    np.testing.assert_allclose(
        np.asarray(fn2(jnp.asarray(imgs))), got, rtol=2e-2, atol=2e-2
    )


def test_u8_folded_forward_matches_normalize_path():
    """s2d-folded uint8 float stem (make_float_stem_s2d) ≡ normalize +
    apply_folded for every CNN family — the bf16/W8A16/W4A16 serving
    fast path. fp32 dtype so the only difference is summation order."""
    import logging

    import jax

    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
        u8_folded_forward,
    )
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images
    from inference_efficient_vision_models_tpu.models import create_model

    class Cfg:
        batch_size = 4
        calibration_images = 8
        DEBUG_MODE = False
        image_size = (64, 64)
        compute_dtype = "float32"

    rng = np.random.default_rng(21)
    imgs = rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    for name in ("resnet18", "mobilenet_v2", "efficientnet_b0"):
        spec, params, state = create_model(name, num_classes=6)
        eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
        qmod = eng.q
        ref = np.asarray(
            jax.jit(
                lambda x: qmod.apply_folded(spec, eng.folded, normalize_images(x))
            )(jnp.asarray(imgs))
        )
        fwd = u8_folded_forward(
            spec, eng.folded, dtype=jnp.float32, image_size=(64, 64)
        )
        got = np.asarray(jax.jit(fwd)(jnp.asarray(imgs)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4), name
        # and the pre-packed s2d layout gives the identical program result
        from inference_efficient_vision_models_tpu.ops.space_to_depth import (
            space_to_depth_u8,
        )

        got2 = np.asarray(jax.jit(fwd)(jnp.asarray(space_to_depth_u8(imgs))))
        np.testing.assert_allclose(got2, got, rtol=1e-5, atol=1e-5)


def test_u8_folded_forward_vit_patch_embed():
    """The s2d-folded uint8 patch embed ≡ normalize + ViT apply_folded."""
    import logging

    import jax

    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
        u8_folded_forward,
    )
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images
    from inference_efficient_vision_models_tpu.models import create_model

    class Cfg:
        batch_size = 2
        calibration_images = 4
        DEBUG_MODE = False
        image_size = (224, 224)
        compute_dtype = "float32"

    rng = np.random.default_rng(23)
    imgs = rng.integers(0, 255, (2, 224, 224, 3)).astype(np.uint8)
    spec, params, state = create_model("vit_tiny_patch16_224", num_classes=6)
    eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
    ref = np.asarray(
        jax.jit(
            lambda x: eng.q.apply_folded(spec, eng.folded, normalize_images(x))
        )(jnp.asarray(imgs))
    )
    fwd = u8_folded_forward(spec, eng.folded, dtype=jnp.float32)
    got = np.asarray(jax.jit(fwd)(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
