"""PRNG-key discipline.

The reference seeds four global RNGs (`teacher_training/utils.py:128-137`).
JAX is functional: there is one root key per experiment, and every consumer
derives a named fold-out via `jax.random.fold_in`, so runs are reproducible
and device-count independent.
"""

from __future__ import annotations

import random
import zlib

import numpy as np
import jax


def set_seed(seed: int = 42) -> jax.Array:
    """Seed host-side RNGs (numpy drives data shuffling) and return the root key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def key_for(root: jax.Array, *names) -> jax.Array:
    """Derive a deterministic subkey from a path of names/ints.

    ``key_for(root, "fold", 3, "init")`` always yields the same key for the
    same root — the functional replacement for global `torch.manual_seed`.
    """
    key = root
    for name in names:
        if isinstance(name, str):
            name = zlib.crc32(name.encode())
        key = jax.random.fold_in(key, int(name) & 0x7FFFFFFF)
    return key
