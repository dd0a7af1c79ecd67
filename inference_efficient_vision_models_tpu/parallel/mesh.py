"""Mesh + sharding layer — the distributed backend of the rebuild.

The reference is single-process/single-device with no communication backend
(SURVEY.md §2.4); the only multi-device residue is tolerance for
DataParallel's ``module.`` checkpoint prefix. Here parallelism is first-class
and TPU-native: a 2-D ``jax.sharding.Mesh`` with axes ``("data", "model")``,

* **data axis (DP)** — batches are sharded along it; gradients are reduced by
  the XLA-inserted ``psum`` over ICI when the jitted global-view train step
  runs (no hand-written collectives, no NCCL translation),
* **model axis (TP)** — optional tensor parallelism for wide layers; at
  ResNet scale only the classifier head benefits, and the mesh abstraction
  admits wider use (the sharding rules are per-path predicates).

Multi-host: call ``initialize_distributed()`` (jax.distributed) before device
queries; per-host data loading feeds the local shard via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (controller-less). Safe no-op on a single host.

    Called from every stage CLI (cli/common.setup_stage). Initialization is
    gated on explicit coordinates — either kwargs or the standard
    ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``
    env vars (also auto-set by TPU pod / SLURM launchers jax recognizes) —
    so single-process runs never touch the coordination service.
    """
    import os

    if not (kwargs or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    model_parallel: int = 1,
) -> Mesh:
    """All visible devices as a (data, model) mesh.

    ``model_parallel`` splits off a model axis; the remainder is data
    parallel. Device order comes from ``mesh_utils.create_device_mesh`` so
    neighboring mesh coordinates are ICI neighbors.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    shape = (n // model_parallel, model_parallel)
    if n == 1:
        mesh_devices = np.asarray(devices).reshape(shape)
    else:
        mesh_devices = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params, *, tp_head: bool = True):
    """Sharding pytree for model params.

    DP replicates everything. With ``tp_head``, the classifier head is
    tensor-parallel over the model axis: fc kernel (in, out) → P(None,
    "model"), fc bias (out,) → P("model") — a real TP sharding XLA turns
    into an all-gather of logits only when the global view requires it.
    """
    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if tp_head and "fc" in keys:
            if leaf.ndim == 2:
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def replicate(mesh: Mesh, tree):
    """Place a host pytree fully replicated over the mesh.

    Multi-host: every process holds the complete (identical) value, so
    ``make_array_from_process_local_data`` assembles the replicated global
    array without cross-process transfers; single-host it is a device_put.
    """
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
            tree,
        )
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch so its leading dim is split over the data axis.

    Multi-host: each process passes its LOCAL shard of the global batch and
    the pieces assemble into one global array
    (``jax.make_array_from_process_local_data``); single-host it is a plain
    sharded device_put.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
            batch,
        )
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
