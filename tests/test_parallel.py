"""Multi-device tests on the 8-virtual-device CPU backend (conftest):
DP sharded training through the REAL train loop, TP head shardings,
single-vs-multi-device numerical agreement."""

import logging

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from inference_efficient_vision_models_tpu.data import make_synthetic_neudet
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)
from inference_efficient_vision_models_tpu.train import (
    adamw_init,
    make_train_step,
)


def test_eight_devices_present():
    assert jax.device_count() == 8


def test_train_loop_runs_data_parallel(tmp_path):
    """train_classifier auto-shards batches over all 8 devices."""
    from inference_efficient_vision_models_tpu.core import TeacherConfig
    from inference_efficient_vision_models_tpu.train import train_classifier

    cfg = TeacherConfig(
        experiment_name="dp",
        artifacts_root=str(tmp_path),
        batch_size=16,
        epochs=1,
        image_size=(32, 32),
        compute_dtype="float32",
        synthetic_data=True,
    )
    imgs, labels = make_synthetic_neudet(8, 32, seed=0)
    spec, params, state = create_model("resnet18", num_classes=6)
    params, state, hist = train_classifier(
        cfg, spec, params, state, (imgs, labels), (imgs[:16], labels[:16]),
        str(tmp_path / "fold_0"), logging.getLogger("dp"), save=False,
    )
    assert np.isfinite(hist["train_loss"]).all()


def test_dp_matches_single_device():
    """One sharded step == one unsharded step (same math, psum-reduced)."""
    spec, params, state = create_model("resnet18", num_classes=6)
    step = make_train_step(spec, learning_rate=1e-3, compute_dtype="float32")

    rng = np.random.default_rng(0)
    batch = (
        rng.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8),
        rng.integers(0, 6, 16).astype(np.int32),
        np.ones(16, np.float32),
    )
    opt = adamw_init(params)
    p1, s1, o1, m1 = jax.jit(step.__wrapped__)(params, state, opt, batch)

    mesh = make_mesh(model_parallel=1)
    sharded = shard_batch(mesh, batch)
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    opt_r = adamw_init(params_r)
    p2, s2, o2, m2 = step(params_r, state_r, opt_r, sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.device_get(p1["fc"]["w"])
    l2 = jax.device_get(p2["fc"]["w"])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-5)


def test_dp_tp_combined_step_matches_replicated():
    """A full train step over a data=4 × model=2 mesh — with the classifier
    head REALLY tensor-parallel — must match the single-device step."""
    spec, params, state = create_model("resnet18", num_classes=6)
    step = make_train_step(spec, learning_rate=1e-3, compute_dtype="float32")

    rng = np.random.default_rng(1)
    batch = (
        rng.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8),
        rng.integers(0, 6, 16).astype(np.int32),
        np.ones(16, np.float32),
    )
    opt = adamw_init(params)
    st1 = jax.jit(step.__wrapped__)
    p1, s1, o1, m1 = st1(params, state, opt, batch)
    p1 = jax.device_get(p1)  # the step donates its inputs — snapshot first
    _, _, _, m1b = st1(p1, s1, o1, batch)

    mesh = make_mesh(model_parallel=2)
    sh = param_shardings(mesh, params, tp_head=True)
    params_s = jax.tree.map(jax.device_put, params, sh)
    state_s = jax.device_put(state, NamedSharding(mesh, P()))
    opt_s = adamw_init(params_s)
    sharded = shard_batch(mesh, batch)
    p2, s2, o2, m2 = step(params_s, state_s, opt_s, sharded)
    fc_spec = p2["fc"]["w"].sharding.spec
    p2 = jax.device_get(p2)
    _, _, _, m2b = step(jax.tree.map(jax.device_put, p2, sh), s2, o2, sharded)

    assert fc_spec == P(None, "model")  # stayed TP
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # the TP-sharded head receives a real gradient — its update must match
    # element-for-element
    for path in (("fc", "w"), ("fc", "b")):
        a, b = p1, p2
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            jax.device_get(a), jax.device_get(b), rtol=1e-4, atol=1e-5,
            err_msg=f"param {path} diverged under DP+TP",
        )
    # replicated params: AdamW's first step is ~sign(g)·lr, so near-zero
    # gradients legitimately flip sign under a different psum reduction order
    # — bound every element by 2.2·lr and require near-exact agreement for
    # the overwhelming majority
    d = np.abs(jax.device_get(p1["conv1"]["w"]) - jax.device_get(p2["conv1"]["w"]))
    assert d.max() <= 2.2e-3, d.max()
    assert (d < 1e-5).mean() > 0.97, (d < 1e-5).mean()
    # gross gradient errors (wrong collective, garbage shard) compound into
    # the second step's loss; sign-descent flips only move it ~0.5%
    np.testing.assert_allclose(float(m1b["loss"]), float(m2b["loss"]), rtol=3e-2)


def test_tp_head_shardings():
    mesh = make_mesh(model_parallel=2)
    spec, params, state = create_model("resnet18", num_classes=6)
    sh = param_shardings(mesh, params, tp_head=True)
    assert sh["fc"]["w"].spec == P(None, "model")
    assert sh["fc"]["b"].spec == P("model")
    assert sh["conv1"]["w"].spec == P()
    # placing + forward under the mesh works
    params_s = jax.tree.map(jax.device_put, params, sh)
    from inference_efficient_vision_models_tpu.models import resnet

    x = jnp.zeros((4, 32, 32, 3))
    logits, _ = jax.jit(
        lambda p, s, x: resnet.apply(spec, p, s, x, train=False)
    )(params_s, jax.device_put(state, NamedSharding(mesh, P())), x)
    assert logits.shape == (4, 6)
