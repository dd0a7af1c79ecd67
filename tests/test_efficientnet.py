"""EfficientNet family: shapes, torch parity, structured pruning with SE
coupling, BN fold + static int8 — extends zoo generality to MBConv+SE
networks (reference zoo reaches EfficientNet through timm/torchvision,
`teacher_training/utils.py:21-66`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.models.efficientnet import (
    apply as effnet_apply,
    efficientnet_spec,
    param_count,
)
from inference_efficient_vision_models_tpu.models.registry import spec_from_dict


def test_spec_roundtrip_and_b0_table():
    spec = efficientnet_spec("efficientnet_b0", num_classes=6)
    assert spec.stage_widths == (16, 24, 40, 80, 112, 192, 320)
    assert spec.depths == (1, 2, 2, 3, 3, 4, 1)
    assert spec.stage_kernels == (3, 3, 5, 3, 5, 5, 3)
    assert spec.last_width == 1280
    assert not spec.has_expand[0][0] and spec.has_expand[1][0]
    # SE squeeze = block input channels // 4 (torchvision semantics)
    assert spec.se_widths[0][0] == 8      # 32 // 4
    assert spec.se_widths[1][0] == 4      # 16 // 4
    assert spec.se_widths[1][1] == 6      # 24 // 4
    back = spec_from_dict(spec.to_dict())
    assert back == spec


def test_variant_multipliers():
    b1 = efficientnet_spec("efficientnet_b1", num_classes=6)
    assert b1.stage_widths == efficientnet_spec("efficientnet_b0").stage_widths
    assert b1.depths == (2, 3, 3, 4, 4, 5, 2)  # ceil(n * 1.1)
    b2 = efficientnet_spec("efficientnet_b2", num_classes=6)
    assert b2.stage_widths[1] == 24 and b2.stage_widths[-1] == 352  # 1.1x widths
    assert b2.depths == (2, 3, 3, 4, 4, 5, 2)


def test_b4_b7_variant_tables():
    """Compound-scaled variants match torchvision _efficientnet_conf
    (width/depth multipliers + divisible-by-8 rounding + ceil repeats)."""
    b4 = efficientnet_spec("efficientnet_b4", num_classes=6)
    assert b4.stem_width == 48                       # 32 * 1.4 → 48
    assert b4.stage_widths == (24, 32, 56, 112, 160, 272, 448)
    assert b4.depths == (2, 4, 4, 6, 6, 8, 2)        # ceil(n * 1.8)
    assert b4.last_width == 4 * 448
    b7 = efficientnet_spec("efficientnet_b7", num_classes=6)
    assert b7.stem_width == 64
    assert b7.stage_widths == (32, 48, 80, 160, 224, 384, 640)
    assert b7.depths == (4, 7, 7, 10, 10, 13, 4)     # ceil(n * 3.1)
    # spec JSON round-trip and a tiny forward keep the big variants honest
    assert spec_from_dict(b4.to_dict()) == b4
    spec, params, state = create_model("efficientnet_b4", num_classes=6)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 3)), jnp.float32)
    logits, _ = effnet_apply(spec, params, state, x, train=False)
    assert logits.shape == (1, 6) and np.isfinite(np.asarray(logits)).all()


def test_forward_shapes_and_param_count():
    spec, params, state = create_model("efficientnet_b0", num_classes=6)
    # matches tests/torch_ref.efficientnet_b0(num_classes=6) exactly
    assert param_count(params) == 4_015_234
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    logits, new_state = effnet_apply(spec, params, state, x, train=False)
    assert logits.shape == (2, 6)
    logits_t, st_t = effnet_apply(spec, params, state, x, train=True)
    assert logits_t.shape == (2, 6)
    assert not np.allclose(
        np.asarray(st_t["stem_bn"]["mean"]), np.asarray(state["stem_bn"]["mean"])
    )


def _randomized_torch_oracle(seed=0):
    """Torch oracle with non-identity BN stats (otherwise an untrained deep
    MBConv stack collapses to ~0 activations in eval mode and parity is
    vacuous)."""
    import torch

    from tests.torch_ref import efficientnet_b0 as torch_effnet

    torch.manual_seed(seed)
    tm = torch_effnet(num_classes=6).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)
    return tm


def test_torch_parity():
    """Same weights → same logits as the torch oracle (eval mode)."""
    import torch

    from inference_efficient_vision_models_tpu.models.torch_import import (
        from_torch_state_dict_effnet,
    )

    tm = _randomized_torch_oracle()
    spec = efficientnet_spec("efficientnet_b0", num_classes=6)
    params, state = from_torch_state_dict_effnet(spec, tm.state_dict())

    x = np.random.default_rng(0).normal(size=(2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got, _ = effnet_apply(spec, params, state, jnp.asarray(x), train=False)
    assert float(np.abs(want).max()) > 1e-3  # non-degenerate oracle
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_train_step_runs():
    from inference_efficient_vision_models_tpu.train.optim import adamw_init
    from inference_efficient_vision_models_tpu.train.steps import make_train_step

    spec, params, state = create_model("efficientnet_b0", num_classes=6)
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
# structured pruning with the SE coupling
# ----------------------------------------------------------------------------


def _forward(spec, params, state, x):
    return np.asarray(
        effnet_apply(spec, params, state, jnp.asarray(x), train=False)[0]
    )


def test_zeroed_channel_prune_is_exact_effnet():
    """Zero channels across every coupled slice (incl. SE rows/cols + biases),
    prune exactly those, require near-identical logits from the smaller
    model. This exercises the SE edge type: a kept hidden channel must keep
    its se_expand column, a kept squeeze unit its se_reduce column."""
    from inference_efficient_vision_models_tpu.compress.prune.engine import (
        apply_pruning,
    )
    from inference_efficient_vision_models_tpu.compress.prune.graph import (
        get_path,
        group_slices,
        set_path,
    )

    spec, params, state = create_model("efficientnet_b0", num_classes=6)
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
        for path in g.get("vectors", ()):
            v = np.asarray(get_path(params, path)).copy()
            v[kill] = 0.0
            set_path(params, path, v)
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
    assert new_spec.se_widths != spec.se_widths
    assert new_spec.hidden_widths[0][0] == new_spec.stem_width  # t=1 invariant
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_se_zeroing_is_not_exact_without_coupling():
    """Sanity check that the SE edges are load-bearing: zeroing a hidden
    channel's conv slices WITHOUT zeroing its se_expand column changes the
    gate of every other channel (GAP sees the zeroed channel), so the
    pruned model would NOT match — i.e. the exactness above is earned."""
    from inference_efficient_vision_models_tpu.compress.prune.graph import (
        group_slices,
    )

    spec, _, _ = create_model("efficientnet_b0", num_classes=6)
    for g in group_slices(spec):
        if g["key"][0] == "hidden":
            producers = {p for p, _ in g["producers"]}
            assert any("se_expand" in p for p in producers)
            consumers = {p for p, _ in g["consumers"]}
            assert any("se_reduce" in p for p in consumers)
        if g["key"][0] == "se":
            assert any("se_reduce" in p for p, _ in g["producers"])
            assert any("se_expand" in p for p, _ in g["consumers"])


def test_prune_model_shrinks_and_runs_effnet():
    from inference_efficient_vision_models_tpu.compress.prune import prune_model

    spec, params, state = create_model("efficientnet_b0", num_classes=6)
    n0 = param_count(params)
    new_spec, p2, s2 = prune_model(
        spec, params, state, ratio=0.2, method="l2", round_to=8
    )
    assert param_count(p2) < n0 * 0.85
    for w in new_spec.stage_widths + (new_spec.stem_width, new_spec.last_width):
        assert w % 8 == 0
    logits = _forward(new_spec, p2, s2, np.zeros((1, 32, 32, 3), np.float32))
    assert logits.shape == (1, 6)


# ----------------------------------------------------------------------------
# quantization (stage 4) for the efficientnet family
# ----------------------------------------------------------------------------

from inference_efficient_vision_models_tpu.compress.quant import qeffnet
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


def _parity_model():
    """Imported torch weights with randomized BN stats → non-degenerate
    activations for fold/quant checks."""
    from inference_efficient_vision_models_tpu.models.torch_import import (
        from_torch_state_dict_effnet,
    )

    tm = _randomized_torch_oracle(seed=2)
    spec = efficientnet_spec("efficientnet_b0", num_classes=6)
    params, state = from_torch_state_dict_effnet(spec, tm.state_dict())
    return spec, params, state


def test_bn_fold_exact_effnet():
    spec, params, state = _parity_model()
    folded = qeffnet.fold(spec, params, state)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    ref, _ = effnet_apply(spec, params, state, x, train=False)
    got = qeffnet.apply_folded(spec, folded, x)
    assert float(np.abs(np.asarray(ref)).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_static_int8_close_and_roundtrips():
    import logging

    from flax import serialization

    spec, params, state = _parity_model()
    eng = QuantizationEngine(_Cfg(), spec, params, state, logging.getLogger("qe"))
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (32, 64, 64, 3)).astype(np.uint8)
    labels = rng.integers(0, 6, 32).astype(np.int64)
    qmodel, qfn = eng.static_quantize((imgs, labels))

    lf = np.asarray(
        qeffnet.apply_folded(spec, eng.folded, normalize_images(jnp.asarray(imgs)))
    )
    lq = np.asarray(qfn(jnp.asarray(imgs)))
    assert (lq.argmax(1) == lf.argmax(1)).mean() >= 0.9

    blob = serialization.msgpack_restore(
        serialization.to_bytes(qeffnet.serializable(jax.device_get(qmodel)))
    )
    q2 = qeffnet.restore_derived(blob)
    lq2 = np.asarray(
        jax.jit(lambda q, x: qeffnet.apply_int8(spec, q, x))(q2, jnp.asarray(imgs))
    )
    np.testing.assert_allclose(lq2, lq, rtol=1e-5, atol=1e-5)

    # mixed executor (int8 1×1 + bf16 dw + fp32 SE) over the SAME artifact
    lm = np.asarray(
        jax.jit(lambda q, x: qeffnet.apply_int8_mixed(spec, q, x))(
            q2, jnp.asarray(imgs)
        )
    )
    assert (lm.argmax(1) == lf.argmax(1)).mean() >= 0.9


def test_dynamic_and_half_paths():
    import logging

    spec, params, state = _parity_model()
    eng = QuantizationEngine(_Cfg(), spec, params, state, logging.getLogger("qe"))
    imgs = np.random.default_rng(4).integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    _, fn_dyn = eng.dynamic_quantize()
    assert np.asarray(fn_dyn(jnp.asarray(imgs))).shape == (4, 6)
    _, fn16 = eng.cast_half(jnp.bfloat16)
    assert np.asarray(fn16(jnp.asarray(imgs))).shape == (4, 6)
