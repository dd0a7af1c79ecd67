"""Quantization-aware fine-tuning (QAT) on the folded model.

The reference's static-int8 path is post-training-only
(`/root/reference/quantization/main.py:184-242`), and its published table
eats a −1.1% accuracy drop on EfficientNet
(`/root/reference/README.md:62`). QAT closes that gap: after calibration,
the folded fp32 model is fine-tuned for a few epochs with the int8 forward
*simulated* in fp32 — every activation tap fake-quantized to its frozen
observer range and every weight fake-quantized per-channel symmetric —
using straight-through-estimator gradients. The fine-tuned folded weights
then go through the ordinary ``convert_static_int8`` with the SAME
observers, so the deployed int8 program is exactly the one that was
trained against.

Design notes (TPU):
* One jitted train step: normalize → fake-quant forward → CE → backward →
  AdamW. The fake-quant ops are elementwise round/clip pairs that XLA fuses
  into the surrounding convs — a QAT step costs ~the same as a plain
  fine-tune step.
* The activation hook rides the family modules' ``apply_folded(...,
  tap_fn=…)`` — the tap set IS the conversion's quantization-point set, so
  simulation and deployment can't drift apart.
* Observer ranges stay frozen during QAT (standard practice; the weights
  adapt to the grid, not the grid to the weights).
* Weight fake-quant recomputes per-channel scales from the *current*
  weights each step (jittable mirror of
  ``observers.quantize_weight_per_channel``), matching what conversion
  will do to the final weights.
* The "input" tap is NOT fake-quantized by default: the deployed stems
  fold normalization and consume raw uint8 exactly (stemfold), so the
  input carries no extra quantization noise to train against.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .observers import EPS, ObserverState, minmax_qparams_affine

__all__ = [
    "fake_quant_act",
    "fake_quant_weight",
    "fake_quant_weight_int4",
    "fq_weights",
    "fq_weights_w4",
    "qat_finetune",
    "w4_qat_finetune",
]


def fake_quant_act(x, scale: float, zp: int):
    """Simulated quint8 affine quantization with an STE gradient.

    Forward: clip to the representable window, round to the grid. Backward:
    identity inside the window, zero outside (the clip's own gradient)."""
    lo = (0 - zp) * scale
    hi = (255 - zp) * scale
    xc = jnp.clip(x, lo, hi)
    deq = jnp.round(xc / scale) * scale
    return xc + lax.stop_gradient(deq - xc)


def fake_quant_weight(w, channel_axis: int):
    """Simulated qint8 symmetric per-channel weight quantization (STE).

    Scales are recomputed from the live weights each call — the jittable
    mirror of ``observers.quantize_weight_per_channel`` (same 127.5 divisor,
    round-half-to-even)."""
    axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.maximum(amax / 127.5, EPS)
    deq = jnp.clip(jnp.round(w / scale), -128, 127) * scale
    return w + lax.stop_gradient(deq - w)


def fake_quant_weight_int4(w):
    """Simulated group-wise symmetric int4 weight quantization (STE).

    Jittable mirror of ``wo4.quantize_weight_int4``'s grid: the flattened
    reduction axis is split into the same shape-derived groups
    (``wo4._pick_group``), scales are max|w|/7 per (group, out-channel),
    values round to [-7, 7]. Scales are recomputed from the live weights
    each step, matching what conversion does to the final weights."""
    from .wo4 import _pick_group

    out = w.shape[-1]
    r = int(np.prod(w.shape[:-1]))
    g = _pick_group(r)
    wg = w.reshape(r // g, g, out)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=1, keepdims=True) / 7.0, 1e-12)
    deq = (jnp.clip(jnp.round(wg / s), -7, 7) * s).reshape(w.shape)
    return w + lax.stop_gradient(deq - w)


def fq_weights(folded):
    """Fake-quantize every weight leaf of a folded pytree (differentiable).

    Channel-axis convention mirrors the conversions: 4D conv kernels (HWIO,
    incl. depthwise) → axis 3; 2D matrices (dense / SE, stored (in, out)) →
    axis 1. Biases, LN/embedding vectors, etc. pass through untouched."""

    def fq_node(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and hasattr(v, "ndim") and v.ndim == 4:
                    out[k] = fake_quant_weight(jnp.asarray(v), 3)
                elif k == "w" and hasattr(v, "ndim") and v.ndim == 2:
                    out[k] = fake_quant_weight(jnp.asarray(v), 1)
                else:
                    out[k] = fq_node(v)
            return out
        return node

    return fq_node(folded)


def fq_weights_w4(folded, keep_int8=None):
    """Fake-quantize weight leaves onto the W4A16 deployment grid.

    Differentiable mirror of ``wo4.convert_weight_only_int4``'s walk: each
    ``"w"`` leaf gets the int4 group grid, except leaves the ``keep_int8``
    policy (default ``wo4._keep_int8_auto``) routes to the per-channel int8
    fallback — exactly the leaves conversion will keep int8. Biases and
    vectors pass through (W4A16 stores them fp32)."""
    from .wo4 import _keep_int8_auto

    if keep_int8 is None:
        keep_int8 = _keep_int8_auto

    def walk(node, path=()):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and hasattr(v, "ndim") and v.ndim >= 2:
                    a = jnp.asarray(v)
                    if a.shape[-1] % 2 != 0 or keep_int8(path + (k,), a):
                        out[k] = fake_quant_weight(a, a.ndim - 1)
                    else:
                        out[k] = fake_quant_weight_int4(a)
                else:
                    out[k] = walk(v, path + (k,))
            return out
        return node

    return walk(folded)


def w4_qat_finetune(
    spec, qmod, folded, train_data,
    *, epochs: int = 1, lr: float = 1e-5, batch_size: int = 32,
    keep_int8=None, bits: int = 4, logger=None, debug: bool = False,
):
    """Fine-tune the folded model against the simulated weight-only forward.

    No activation fake-quant — W4A16/W8A16 serve full-precision (bf16)
    activations; only the weights see the grid they will be rounded onto:
    ``bits=4`` → the int4 group grid + int8-fallback policy
    (``fq_weights_w4``, ready for ``wo4.convert_weight_only_int4`` with the
    same ``keep_int8`` policy); ``bits=8`` → the per-channel int8 grid
    (``fq_weights``, ready for ``wo8.convert_weight_only`` — same last-axis
    channel convention). Returns a new folded pytree."""
    from ...data.pipeline import Batches, normalize_images
    from ...train.losses import cross_entropy
    from ...train.optim import adamw_init, adamw_update

    if bits == 4:
        fq = lambda f: fq_weights_w4(f, keep_int8)  # noqa: E731
    elif bits == 8:
        fq = fq_weights
    else:
        raise ValueError(f"weight-only QAT supports bits 4 or 8, got {bits}")

    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), folded)
    opt = adamw_init(params)

    def loss_fn(f, x, labels, mask):
        logits = qmod.apply_folded(spec, fq(f), x)
        return cross_entropy(logits, labels, mask)

    @jax.jit
    def step(f, opt_state, imgs_u8, labels, mask):
        x = normalize_images(imgs_u8)
        loss, grads = jax.value_and_grad(loss_fn)(f, x, labels, mask)
        f2, opt2 = adamw_update(f, grads, opt_state, lr=lr, weight_decay=0.0)
        return f2, opt2, loss

    for epoch in range(int(epochs)):
        loader = Batches(
            train_data[0], train_data[1], batch_size, shuffle=True, seed=epoch
        )
        for i, (imgs, labels, mask) in enumerate(loader):
            if debug and i == 2:
                break
            params, opt, loss = step(
                params, opt, jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(mask)
            )
        if logger is not None:
            logger.info(
                "W%d QAT epoch %d/%d: loss %.4f", bits, epoch + 1, epochs, float(loss)
            )
    return jax.tree.map(lambda a: np.asarray(a, np.float32), jax.device_get(params))


def qat_finetune(
    spec, qmod, folded, observers: Dict[str, ObserverState], train_data,
    *, epochs: int = 1, lr: float = 1e-5, batch_size: int = 32,
    fq_input: bool = False, logger=None, debug: bool = False,
):
    """Fine-tune the folded model against the simulated int8 forward.

    Returns a new folded pytree (np.float32 leaves, same structure) ready
    for ``convert_static_int8`` with the same ``observers``."""
    from ...data.pipeline import Batches, normalize_images
    from ...train.losses import cross_entropy
    from ...train.optim import adamw_init, adamw_update

    fq_params = {
        name: minmax_qparams_affine(o.min, o.max) for name, o in observers.items()
    }

    def tap_fn(name, t):
        if name == "input" and not fq_input:
            return t
        s, zp = fq_params[name]
        return fake_quant_act(t, s, zp)

    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), folded)
    opt = adamw_init(params)

    def loss_fn(f, x, labels, mask):
        logits = qmod.apply_folded(spec, fq_weights(f), x, tap_fn=tap_fn)
        return cross_entropy(logits, labels, mask)

    @jax.jit
    def step(f, opt_state, imgs_u8, labels, mask):
        x = normalize_images(imgs_u8)
        loss, grads = jax.value_and_grad(loss_fn)(f, x, labels, mask)
        # QAT is a repair pass, not training: no weight decay (it would
        # fight the frozen activation grid), small constant lr
        f2, opt2 = adamw_update(f, grads, opt_state, lr=lr, weight_decay=0.0)
        return f2, opt2, loss

    for epoch in range(int(epochs)):
        loader = Batches(
            train_data[0], train_data[1], batch_size, shuffle=True, seed=epoch
        )
        for i, (imgs, labels, mask) in enumerate(loader):
            if debug and i == 2:
                break
            params, opt, loss = step(
                params, opt, jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(mask)
            )
        if logger is not None:
            logger.info("QAT epoch %d/%d: loss %.4f", epoch + 1, epochs, float(loss))
    return jax.tree.map(lambda a: np.asarray(a, np.float32), jax.device_get(params))
