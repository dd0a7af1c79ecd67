"""Test harness: force an 8-virtual-device CPU backend BEFORE jax imports.

Multi-device sharding tests (DP/TP pjit paths) run against XLA's host-platform
device emulation, per SURVEY.md §4 — no TPU needed in CI.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honored when a TPU platform plugin (axon) is
# present; the config update is.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
