"""Model-zoo tests: shapes, param counts, and numerical parity vs torchvision.

Parity is the strongest correctness check available offline: build a
randomly-initialized torchvision ResNet (no download), copy its weights into
our pytree via the torch-import converter, and require eval-mode logits to
match within fp32 conv tolerance.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.models import (
    create_model,
    resnet,
    resnet_spec,
)
from inference_efficient_vision_models_tpu.models.torch_import import (
    from_torch_state_dict,
)


@pytest.mark.parametrize("name,expected_params", [
    ("resnet18", 11_689_512),  # torchvision counts @ 1000 classes
    ("resnet34", 21_797_672),
    ("resnet50", 25_557_032),
    ("resnet101", 44_549_160),
    ("resnet152", 60_192_808),
])
def test_param_count_matches_torchvision(name, expected_params):
    spec, params, state = create_model(name, num_classes=1000)
    assert resnet.param_count(params) == expected_params


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_forward_shapes(name):
    spec, params, state = create_model(name, num_classes=6)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    logits, new_state = resnet.apply(spec, params, state, x, train=False)
    assert logits.shape == (2, 6)
    # train mode must update BN running stats
    logits_t, st_t = resnet.apply(spec, params, state, x, train=True)
    assert not np.allclose(st_t["bn1"]["mean"], state["bn1"]["mean"])


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_parity_vs_torchvision(name):
    torch = pytest.importorskip("torch")
    from tests import torch_ref

    tm = getattr(torch_ref, name)(num_classes=6)
    tm.eval()

    spec = resnet_spec(name, num_classes=6)
    params, state = from_torch_state_dict(spec, tm.state_dict())

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    got, _ = jax.jit(
        lambda p, s, x: resnet.apply(spec, p, s, x, train=False)
    )(params, state, jnp.asarray(x))
    got = np.asarray(got)

    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_train_mode_bn_parity_vs_torch():
    """BN batch-stats + running-stat update semantics match torch."""
    torch = pytest.importorskip("torch")
    from tests import torch_ref

    tm = torch_ref.resnet18(num_classes=6)
    tm.train()

    spec = resnet_spec("resnet18", num_classes=6)
    params, state = from_torch_state_dict(spec, tm.state_dict())

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    got, new_state = resnet.apply(
        spec, params, state, jnp.asarray(x), train=True
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)
    # running stats after one train step must match torch's update
    np.testing.assert_allclose(
        np.asarray(new_state["bn1"]["mean"]),
        tm.bn1.running_mean.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["bn1"]["var"]),
        tm.bn1.running_var.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


def test_spec_roundtrip():
    spec = resnet_spec("resnet50", num_classes=6)
    from inference_efficient_vision_models_tpu.models import ResNetSpec

    assert ResNetSpec.from_dict(spec.to_dict()) == spec


def test_bf16_compute_close_to_fp32():
    spec, params, state = create_model("resnet18", num_classes=6)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 64, 64, 3)), jnp.float32)
    f32, _ = resnet.apply(spec, params, state, x, train=False)
    bf16, _ = resnet.apply(spec, params, state, x, train=False, compute_dtype=jnp.bfloat16)
    assert np.max(np.abs(np.asarray(f32) - np.asarray(bf16))) < 0.35


def test_device_profile_tolerates_any_backend():
    """profile_device_ops returns a (possibly empty) sorted op table without
    raising — on the CPU CI backend there may be no device rows."""
    import jax

    from inference_efficient_vision_models_tpu.metrics.device_profile import (
        profile_device_ops,
    )

    f = jax.jit(lambda x: x * 2 + 1)
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    rows = profile_device_ops(lambda: jax.block_until_ready(f(x)), iters=3)
    assert isinstance(rows, list)
    for r in rows:
        assert "total_self_us" in r and "name" in r
    assert rows == sorted(rows, key=lambda r: -r["total_self_us"])


def test_parametric_family_names():
    """The zoo's name space is parametric beyond the fixed table — the
    open-factory analog of the reference's any-torchvision-name passthrough
    (`teacher_training/utils.py:21-66`). A parametric name must agree with
    its table twin where both exist, and any novel <D>/<G>x<W>d / _<k>
    combination over the known depth layouts must construct and run."""
    # table twins: identical specs whether hit via the table or the parser
    for name in ("resnext50_32x4d", "wide_resnet50_2", "resnext26_32x4d"):
        from inference_efficient_vision_models_tpu.models.widths import (
            _parse_resnet_name,
        )
        tbl = resnet_spec(name, num_classes=6)
        parsed = _parse_resnet_name(name)
        assert parsed is not None
        block, depths, expansion, groups, base_width = parsed
        assert (block, depths, groups) == (tbl.block, tbl.depths, tbl.groups)

    # novel names: not in the fixed table, still first-class specs
    s = resnet_spec("resnext26_8x8d", num_classes=6)
    assert s.block == "bottleneck" and s.groups == 8
    assert s.inner_widths[0][0] == (64, 64)  # planes·8/64·8 = planes
    s2 = resnet_spec("wide_resnet26_3", num_classes=6)
    assert s2.groups == 1 and s2.inner_widths[0][0] == (192, 192)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    for spec in (s, s2):
        params, state = resnet.init(jax.random.PRNGKey(0), spec)
        logits, _ = resnet.apply(spec, params, state, x, train=False)
        assert logits.shape == (2, 6)

    # malformed / unknown-depth names still fail loudly
    for bad in ("resnext27_32x4d", "wide_resnet18_2", "resnext50_0x4d", "resnet19"):
        with pytest.raises(ValueError):
            resnet_spec(bad, num_classes=6)
