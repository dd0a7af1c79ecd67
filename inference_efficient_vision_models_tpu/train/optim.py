"""AdamW, implemented directly as a pytree transform.

Replaces the reference's ``torch.optim.AdamW(model.parameters(), lr=…)``
(`teacher_training/main.py:67`, `knowledge_distillation/main.py:130`,
`pruning/pruning_engine_structured.py:81`) with torch-default hyperparameters:
β=(0.9, 0.999), eps=1e-8, decoupled weight decay 0.01 applied to every
parameter (torch applies it to all param groups by default).

Pure functions over pytrees — jit/pjit-friendly, shardings flow through.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamWState(NamedTuple):
    step: jax.Array
    mu: Any
    nu: Any


def adamw_init(params) -> AdamWState:
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamWState(step=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.copy, zeros))


def adamw_update(
    params,
    grads,
    opt: AdamWState,
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
):
    step = opt.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        m_hat = m / bc1
        v_hat = v / bc2
        p32 = p.astype(jnp.float32)
        p32 = p32 - lr * weight_decay * p32  # decoupled decay (AdamW)
        p32 = p32 - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        return p32.astype(p.dtype), m, v

    out = jax.tree.map(upd, params, grads, opt.mu, opt.nu)
    new_params = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, AdamWState(step=step, mu=new_mu, nu=new_nu)


def make_lr_schedule(
    kind: str,
    base_lr: float,
    total_steps: int,
    *,
    warmup_steps: int = 0,
    min_fraction: float = 0.0,
):
    """→ jittable ``fn(step int32) -> lr f32``.

    'constant'       — the reference's behavior (no scheduler anywhere in
                       `teacher_training/main.py` / `knowledge_distillation/
                       main.py`); kept as the default for parity.
    'cosine'         — cosine decay base_lr → min_fraction·base_lr.
    'warmup_cosine'  — linear warmup over ``warmup_steps`` then cosine.
    """
    if kind == "constant":
        return lambda step: jnp.float32(base_lr)
    if kind not in ("cosine", "warmup_cosine"):
        raise ValueError(f"unknown lr_schedule {kind!r}")
    warmup = warmup_steps if kind == "warmup_cosine" else 0
    decay_steps = max(total_steps - warmup, 1)

    def fn(step):
        t = step.astype(jnp.float32)
        warm = t / jnp.maximum(warmup, 1)
        prog = jnp.clip((t - warmup) / decay_steps, 0.0, 1.0)
        cos = min_fraction + (1.0 - min_fraction) * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        lr = jnp.where(t < warmup, warm, cos) * base_lr
        return lr.astype(jnp.float32)

    return fn
