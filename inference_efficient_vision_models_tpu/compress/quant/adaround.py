"""AdaRound: learned weight rounding for post-training quantization.

Nearest rounding is not the int8 grid assignment that minimizes task error
(Nagel et al., "Up or Down? Adaptive Rounding for Post-Training
Quantization", ICML 2020). This pass learns, per weight, whether to round
its int8 value down or up, by optimizing a continuous relaxation against
the fp32 folded model's own logits on the calibration images — no labels,
no weight updates, a few hundred Adam steps on the rounding variables only.
It slots between calibration and conversion exactly like QAT
(`engine.static_quantize`, knob ``QuantConfig.adaround_iters``) and is much
cheaper: one scalar per weight is trained, the weights themselves stay
frozen, so it needs only the ≤256-image calibration split the reference
already budgets (`/root/reference/quantization/main.py:157`) rather than
the fold's train data.

Formulation (tap-wise reconstruction, TPU-sized):
  w_soft = s · clip(floor(w/s) + h(v), -127, 127)
  h(v)   = clip(1.2·sigmoid(v) − 0.1, 0, 1)      (rectified sigmoid)
  loss   = Σ_taps MSE(tap_soft, tap_fp32)/scale_tap² + λ · Σ (1 − |2h(v)−1|^β)
with β annealed high→low so h is free early and driven to {0,1} late.
The reconstruction is per conversion tap — every requant point of the
deployed int8 program — computed in ONE jitted program that runs the fp32
forward (targets, stop-gradient) and the simulated-int8 forward (soft
weights + activations fake-quantized to the frozen observer grid, with
quantized-input propagation as in the paper's sequential mode) side by
side. Per-tap errors are normalized by that tap's quantization scale² so
every layer contributes in the same units. A whole-model logit-MSE variant
was tried first and measurably LOST to nearest rounding: with ~10M rounding
variables behind one scalar, per-weight gradients are noise-level, and
Adam's per-parameter normalization turns that noise into ±lr random walks
that flip near-tie roundings arbitrarily. Tap-local terms give every weight
a strong gradient from its own layer — the reason the paper reconstructs
layer-wise.

Conversion-exactness contract (the part that makes this deployable): the
stage-4 conversions re-derive each channel's scale from the folded weights
(``observers.quantize_weight_per_channel``: s = amax/127.5) and re-round.
Hardening therefore (a) keeps each channel's argmax-|w| element at its
ORIGINAL fp32 value — so the re-derived scale is bit-identical to the s
this pass optimized against — and (b) writes every other weight exactly
onto the s-grid with |q| ≤ 127, where re-rounding is the identity
(|q·s/s| = |q| and round(q) = q). The int8 tensors the CLI saves are
exactly the learned rounding; verified in tests/test_adaround.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .observers import EPS, ObserverState, minmax_qparams_affine
from .qat import fake_quant_act

__all__ = ["adaround_refine", "rectified_sigmoid", "init_v"]

_ZETA, _GAMMA = 1.1, -0.1  # rectified-sigmoid stretch (paper constants)


def rectified_sigmoid(v):
    """h(v) ∈ [0, 1]: sigmoid stretched to (γ, ζ) then clipped."""
    return jnp.clip(jax.nn.sigmoid(v) * (_ZETA - _GAMMA) + _GAMMA, 0.0, 1.0)


def init_v(frac):
    """v such that h(v) = frac (for frac in the open interval)."""
    frac = np.clip(np.asarray(frac, np.float32), 0.01, 0.99)
    p = (frac - _GAMMA) / (_ZETA - _GAMMA)
    return np.log(p / (1.0 - p)).astype(np.float32)


def _weight_leaves(folded, fn):
    """Apply ``fn(path, w, channel_axis)`` to every quantizable weight leaf,
    mirroring qat.fq_weights' traversal (4D conv HWIO → axis 3; 2D dense
    (in, out) → axis 1); returns the rebuilt pytree."""

    def walk(node, path):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and hasattr(v, "ndim") and v.ndim == 4:
                    out[k] = fn(path + (k,), v, 3)
                elif k == "w" and hasattr(v, "ndim") and v.ndim == 2:
                    out[k] = fn(path + (k,), v, 1)
                else:
                    out[k] = walk(v, path + (k,))
            return out
        return node

    return walk(folded, ())


def _channel_scale(w, channel_axis):
    """Per-channel symmetric int8 scale, broadcastable to w (jittable mirror
    of observers.minmax_qparams_symmetric_per_channel)."""
    axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    return jnp.maximum(amax / 127.5, EPS)


def _argmax_mask(w, channel_axis):
    """Boolean mask of each channel's (first) argmax-|w| element — the one
    weight hardening must keep at its original value (see module doc)."""
    w = np.asarray(w, np.float32)
    moved = np.moveaxis(np.abs(w), channel_axis, 0)
    flat = moved.reshape(moved.shape[0], -1)
    mask = np.zeros_like(flat, dtype=bool)
    mask[np.arange(flat.shape[0]), flat.argmax(axis=1)] = True
    return np.moveaxis(mask.reshape(moved.shape), 0, channel_axis)


def adaround_refine(
    spec,
    qmod,
    folded,
    observers: Dict[str, ObserverState],
    calib_data,
    *,
    iters: int = 300,
    lr: float = 1e-2,
    batch_size: int = 32,
    reg_weight: float = 0.01,
    beta_hi: float = 20.0,
    beta_lo: float = 2.0,
    logger=None,
) -> Dict:
    """Learn per-weight rounding; return a hardened folded pytree whose
    subsequent ``convert_static_int8`` reproduces the learned int8 grid
    exactly. ``folded`` is unchanged; observers stay frozen throughout."""
    from ...data.pipeline import Batches, normalize_images

    folded = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), folded)

    # Leaves the family's conversion TRANSFORMS before quantizing (stem /
    # patch-embed normalization folding, s2d repack — see stemfold) can't
    # carry a learned rounding: conversion re-derives its grid from the
    # transformed kernel, not this one. They stay at fp32 / nearest.
    skip = set(getattr(qmod, "ADAROUND_SKIP", ()))

    # -- rounding variables, one per quantizable weight ---------------------
    v0 = {}

    def make_v(path, w, channel_axis):
        if path[0] in skip:
            return w
        s = _channel_scale(w, channel_axis)
        frac = np.asarray(w / s - jnp.floor(w / s))
        v0["/".join(path)] = init_v(frac)
        return w

    _weight_leaves(folded, make_v)

    def soft_weights(v_tree):
        def sub(path, w, channel_axis):
            key = "/".join(path)
            if key not in v_tree:
                return w
            s = _channel_scale(w, channel_axis)
            q = jnp.floor(w / s) + rectified_sigmoid(v_tree[key])
            return s * jnp.clip(q, -127.0, 127.0)

        return _weight_leaves(folded, sub)

    # -- frozen activation grid (same taps as deployment / QAT) -------------
    fq_params = {
        name: minmax_qparams_affine(o.min, o.max) for name, o in observers.items()
    }

    batches = [
        (jnp.asarray(imgs), jnp.asarray(mask))
        for imgs, _labels, mask in Batches(calib_data[0], calib_data[1], batch_size)
    ]

    def loss_fn(v_tree, x, beta):
        # fp32 targets, captured at every conversion tap (stop-gradient)
        targets = {}

        def capture(name, t):
            targets[name] = lax.stop_gradient(t)
            return t

        qmod.apply_folded(spec, folded, x, tap_fn=capture)

        # simulated-int8 forward: soft weights, fq activations, and a
        # per-tap reconstruction term in units of that tap's quant step
        recon = []

        def tap_fn(name, t):
            if name == "input":
                return t
            sc, zp = fq_params[name]
            recon.append(jnp.mean((t - targets[name]) ** 2) / (sc * sc))
            return fake_quant_act(t, sc, zp)

        qmod.apply_folded(spec, soft_weights(v_tree), x, tap_fn=tap_fn)
        recon_loss = sum(recon) / max(len(recon), 1)
        reg = sum(
            jnp.sum(1.0 - jnp.abs(2.0 * rectified_sigmoid(v) - 1.0) ** beta)
            for v in jax.tree.leaves(v_tree)
        )
        return recon_loss + reg_weight * reg, recon_loss

    from ...train.optim import adamw_init, adamw_update

    v = {k: jnp.asarray(a) for k, a in v0.items()}
    opt = adamw_init(v)

    @jax.jit
    def step(v, opt_state, x_u8, beta):
        x = normalize_images(x_u8)
        (_, recon), grads = jax.value_and_grad(loss_fn, has_aux=True)(v, x, beta)
        v2, opt2 = adamw_update(v, grads, opt_state, lr=lr, weight_decay=0.0)
        return v2, opt2, recon

    recon = jnp.float32(0.0)
    for it in range(int(iters)):
        x, _mask = batches[it % len(batches)]
        # anneal β only through the final 80% (paper: warm-up then anneal)
        t = max(0.0, it / max(iters - 1, 1) - 0.2) / 0.8
        beta = beta_hi + (beta_lo - beta_hi) * min(t, 1.0)
        v, opt, recon = step(v, opt, x, jnp.float32(beta))
        if logger is not None and (it + 1) % max(iters // 4, 1) == 0:
            logger.info(
                "adaround %d/%d: recon %.6f β %.1f", it + 1, iters, float(recon), beta
            )

    # -- harden --------------------------------------------------------------
    v = jax.device_get(v)

    def harden(path, w, channel_axis):
        key = "/".join(path)
        if key not in v:
            return np.asarray(w, np.float32)
        w = np.asarray(w, np.float32)
        s = np.asarray(_channel_scale(jnp.asarray(w), channel_axis))
        b = (np.asarray(rectified_sigmoid(jnp.asarray(v[key]))) > 0.5)
        q = np.clip(np.floor(w / s) + b, -127, 127)
        hard = (s * q).astype(np.float32)
        keep = _argmax_mask(w, channel_axis)
        return np.where(keep, w, hard)

    hardened = _weight_leaves(jax.device_get(folded), harden)
    return jax.tree.map(lambda a: np.asarray(a, np.float32), hardened)
