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
