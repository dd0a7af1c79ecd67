"""Multi-HOST (multi-process) distributed test.

Launches two REAL jax.distributed processes over the CPU backend (gloo
collectives) and verifies the production multi-host path end-to-end:
``initialize_distributed`` → ``make_mesh`` over global devices →
``shard_batch``'s ``make_array_from_process_local_data`` branch →
``replicate`` for params → one jitted train step — and that the result
matches the single-process step bit-for-bit on the loss.

This covers the `process_count() > 1` branch of parallel/mesh.py that no
in-process test can reach (SURVEY.md §2.4 distributed plan).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from inference_efficient_vision_models_tpu.parallel import (
    initialize_distributed, make_mesh, replicate, shard_batch,
)
initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2 and jax.device_count() == 4

import numpy as np
from inference_efficient_vision_models_tpu.models.vit import ViTSpec, init
from inference_efficient_vision_models_tpu.train import adamw_init, make_train_step

spec = ViTSpec(name="vit_test", patch=8, dim=64, depth=2, heads=2,
               mlp_ratio=2.0, num_classes=6, image_size=32)
params, state = init(jax.random.PRNGKey(0), spec)

rng = np.random.default_rng(0)
imgs = rng.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8)
labels = rng.integers(0, 6, 16).astype(np.int32)
mask = np.ones(16, np.float32)

mesh = make_mesh(model_parallel=1)
params_r = replicate(mesh, jax.device_get(params))
state_r = replicate(mesh, jax.device_get(state))
opt = adamw_init(params_r)

# each process feeds its LOCAL half of the global batch
lo, hi = pid * 8, (pid + 1) * 8
batch = shard_batch(mesh, (imgs[lo:hi], labels[lo:hi], mask[lo:hi]))

step = make_train_step(spec, learning_rate=1e-3, compute_dtype="float32")
p2, s2, o2, m = step(params_r, state_r, opt, batch)
# a fully-replicated global array is addressable on every process
fc_b = np.asarray(p2["head"]["b"].addressable_data(0))
res = {"loss": float(m["loss"]), "acc": float(m["acc"]),
       "n": float(m["n"]), "fc_b": fc_b.ravel().tolist()}
with open(out, "w") as f:
    json.dump(res, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_matches_single(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = os.getcwd()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(tmp_path / f"out{i}.json")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-3000:]

    res = [json.loads((tmp_path / f"out{i}.json").read_text()) for i in range(2)]
    # both processes observe the identical global result
    assert res[0]["loss"] == res[1]["loss"]
    np.testing.assert_array_equal(res[0]["fc_b"], res[1]["fc_b"])
    assert res[0]["n"] == 16.0  # global batch, not the local half

    # single-process reference over the same global batch
    import jax

    from inference_efficient_vision_models_tpu.models.vit import ViTSpec, init
    from inference_efficient_vision_models_tpu.train import adamw_init, make_train_step

    spec = ViTSpec(name="vit_test", patch=8, dim=64, depth=2, heads=2,
                   mlp_ratio=2.0, num_classes=6, image_size=32)
    params, state = init(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)
    batch = (
        rng.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8),
        rng.integers(0, 6, 16).astype(np.int32),
        np.ones(16, np.float32),
    )
    step = make_train_step(spec, learning_rate=1e-3, compute_dtype="float32")
    _p, _s, _o, m = jax.jit(step.__wrapped__)(params, state, adamw_init(params), batch)
    np.testing.assert_allclose(res[0]["loss"], float(m["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res[0]["fc_b"])[: _p["head"]["b"].size],
        np.asarray(jax.device_get(_p["head"]["b"])).ravel(),
        rtol=1e-4, atol=1e-5,
    )
