"""BatchNorm running-statistics recalibration after structural surgery.

Structured pruning changes every layer's input distribution (removed
channels shift the means/variances downstream), so the BN running stats
carried over from the unpruned model are stale — eval-mode accuracy
collapses at aggressive ratios while train-mode (batch-stats) accuracy is
fine. Measured on the r2 ResNet18 student at ratio 0.30: 19% eval accuracy
with stale stats vs >90% once recalibrated. The reference pipeline has the
same blind spot (it relies on fine-tuning epochs to slowly re-estimate
stats through the 0.1-momentum EMA); recalibration fixes it in a handful
of forward passes with no gradient steps.

Method: all four CNN families route through ``resnet.batch_norm``, whose
train-mode update is linear in the batch statistics::

    new = (1 - m) * old + m * batch   =>   batch = old + (new - old) / m

so one train-mode forward per calibration batch recovers that batch's exact
statistics for EVERY BN layer at once, generically over the state pytree —
no per-family hooks. The fresh running stats are the arithmetic mean of the
per-batch statistics (PyTorch's ``momentum=None`` cumulative average). The
whole loop is one jitted ``lax.scan`` over stacked calibration batches: a
single dispatch, no per-layer host round-trips (load-bearing over the axon
tunnel, where per-op dispatch costs dominate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..data.pipeline import normalize_images
from ..models.registry import apply_model
from ..models.resnet import BN_MOMENTUM


def recalibrate_bn(
    spec,
    params,
    state,
    imgs_u8,
    *,
    batch_size: int = 64,
    num_batches: int = 16,
    momentum: float = BN_MOMENTUM,
    compute_dtype="float32",
):
    """Return ``state`` with BN running stats re-estimated on ``imgs_u8``.

    ``imgs_u8``: uint8 NHWC calibration images (train split); uses up to
    ``num_batches`` full batches. Models with no normalization state (ViT)
    are returned unchanged.
    """
    if not jax.tree_util.tree_leaves(state):
        return state
    dtype = jnp.dtype(compute_dtype)
    n_avail = imgs_u8.shape[0] // batch_size
    k = max(min(num_batches, n_avail), 1)
    bs = batch_size if n_avail >= 1 else imgs_u8.shape[0]
    xs = jnp.asarray(imgs_u8[: k * bs]).reshape(k, bs, *imgs_u8.shape[1:])

    @jax.jit
    def run(params, state, xs):
        def step(acc, xb):
            _, new_state = apply_model(
                spec, params, state, normalize_images(xb, dtype),
                train=True, compute_dtype=dtype,
            )
            batch_stats = jax.tree.map(
                lambda o, nw: o + (nw - o) / momentum, state, new_state
            )
            return jax.tree.map(jnp.add, acc, batch_stats), None

        acc0 = jax.tree.map(jnp.zeros_like, state)
        acc, _ = lax.scan(step, acc0, xs)
        return jax.tree.map(lambda a: a / k, acc)

    return run(params, state, xs)
