"""Jitted train / eval steps.

Each step is ONE compiled XLA program: device-side normalization (fused),
forward(s), loss, backward, AdamW update. The reference's per-batch Python
loop bodies (`teacher_training/train.py:19-31`,
`knowledge_distillation/train.py:31-60`) become these functions; the Python
loop that remains only feeds batches and reads metrics.

When a ``mesh`` is provided, steps are sharded global-view programs: batch
split over the data axis, params replicated (optionally TP head), gradient
reduction inserted by XLA as ``psum`` over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.pipeline import normalize_images
from ..models.registry import apply_model, features_and_logits
from .losses import cross_entropy, kd_loss, masked_accuracy, sp_kd_loss
from .optim import adamw_update


def _dtype(name):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(name)]


def make_train_step(spec, *, learning_rate, compute_dtype="bfloat16", mesh=None,
                    weight_decay=0.01, lr_schedule=None, augment_fn=None,
                    augment_seed=0):
    """CE classifier train step: (params, state, opt, batch) → (params, state, opt, metrics).

    ``lr_schedule`` is an optional jittable ``fn(step) -> lr`` (see
    optim.make_lr_schedule); None keeps the constant reference behavior.
    ``augment_fn(key, imgs_u8)`` (data/augment.py) runs INSIDE the program,
    keyed deterministically per (augment_seed, opt.step)."""
    cdt = _dtype(compute_dtype)

    def step(params, state, opt, batch):
        lr = lr_schedule(opt.step) if lr_schedule is not None else learning_rate
        imgs_u8, labels, mask = batch
        if augment_fn is not None:
            akey = jax.random.fold_in(jax.random.PRNGKey(augment_seed), opt.step)
            imgs_u8 = augment_fn(akey, imgs_u8)
        x = normalize_images(imgs_u8, cdt)

        def loss_fn(p):
            logits, new_state = apply_model(
                spec, p, state, x, train=True, compute_dtype=cdt
            )
            loss = cross_entropy(logits, labels, mask)
            return loss, (new_state, logits)

        (loss, (new_state, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        params2, opt2 = adamw_update(
            params, grads, opt, lr=lr, weight_decay=weight_decay
        )
        metrics = {
            "loss": loss,
            "acc": masked_accuracy(logits, labels, mask),
            "n": jnp.sum(mask),
        }
        return params2, new_state, opt2, metrics

    return _jit(step, mesh, donate_argnums=(0, 1, 2))


def make_kd_train_step(
    student_spec,
    teacher_spec,
    *,
    alpha,
    temperature,
    learning_rate,
    compute_dtype="bfloat16",
    mesh=None,
    weight_decay=0.01,
    lr_schedule=None,
    sp_weight=0.0,
    augment_fn=None,
    augment_seed=0,
):
    """KD step: student trains against frozen teacher logits + hard labels.

    Loss = (1-α)·CE + α·KL·T² (reference `knowledge_distillation/train.py:47-57`);
    the teacher forward runs inside the same XLA program (no_grad by
    construction — it is not differentiated).

    ``sp_weight > 0`` adds similarity-preserving feature distillation
    (losses.sp_kd_loss) on the penultimate features — beyond-reference,
    off by default so the stock step reproduces the reference loss exactly.
    """
    cdt = _dtype(compute_dtype)
    use_sp = float(sp_weight) > 0.0

    def step(params, state, opt, teacher_params, teacher_state, batch):
        lr = lr_schedule(opt.step) if lr_schedule is not None else learning_rate
        imgs_u8, labels, mask = batch
        if augment_fn is not None:
            # teacher and student see the SAME augmented batch (standard KD)
            akey = jax.random.fold_in(jax.random.PRNGKey(augment_seed), opt.step)
            imgs_u8 = augment_fn(akey, imgs_u8)
        x = normalize_images(imgs_u8, cdt)
        if use_sp:
            teacher_feats, teacher_logits, _ = features_and_logits(
                teacher_spec, teacher_params, teacher_state, x, train=False,
                compute_dtype=cdt,
            )
            teacher_feats = jax.lax.stop_gradient(teacher_feats)
        else:
            teacher_logits, _ = apply_model(
                teacher_spec, teacher_params, teacher_state, x, train=False,
                compute_dtype=cdt,
            )
        teacher_logits = jax.lax.stop_gradient(teacher_logits)

        def loss_fn(p):
            if use_sp:
                feats, logits, new_state = features_and_logits(
                    student_spec, p, state, x, train=True, compute_dtype=cdt
                )
            else:
                logits, new_state = apply_model(
                    student_spec, p, state, x, train=True, compute_dtype=cdt
                )
            total, ce, kd = kd_loss(
                logits, teacher_logits, labels,
                alpha=alpha, temperature=temperature, mask=mask,
            )
            sp = (
                sp_kd_loss(feats, teacher_feats, mask)
                if use_sp
                else jnp.float32(0.0)
            )
            total = total + sp_weight * sp
            return total, (new_state, logits, ce, kd, sp)

        (loss, (new_state, logits, ce, kd, sp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        params2, opt2 = adamw_update(
            params, grads, opt, lr=lr, weight_decay=weight_decay
        )
        metrics = {
            "loss": loss,
            "ce": ce,
            "kd": kd,
            "sp": sp,
            "acc": masked_accuracy(logits, labels, mask),
            "n": jnp.sum(mask),
        }
        return params2, new_state, opt2, metrics

    return _jit(step, mesh, donate_argnums=(0, 1, 2))


def make_eval_step(spec, *, compute_dtype="float32", mesh=None, apply_fn=None):
    """Eval step → per-batch (sum_loss, sum_correct, n). ``apply_fn`` lets
    quantized/custom forwards reuse the same harness."""
    cdt = _dtype(compute_dtype)
    fwd = apply_fn or (
        lambda params, state, x: apply_model(
            spec, params, state, x, train=False, compute_dtype=cdt
        )[0]
    )

    def step(params, state, batch):
        imgs_u8, labels, mask = batch
        x = normalize_images(imgs_u8, cdt)
        logits = fwd(params, state, x).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        return {
            "sum_loss": jnp.sum(nll * mask),
            "sum_correct": jnp.sum(correct * mask),
            "n": jnp.sum(mask),
        }

    return _jit(step, mesh)


def _jit(fn, mesh, donate_argnums=()):
    """Jit a step; with a mesh, constrain batch args to the data axis.

    Global-view jit: we rely on GSPMD propagation from the batch sharding —
    entry shardings for array args are taken from how the caller placed them
    (see parallel.shard_batch), so the same step works single-device and
    multi-device.
    """
    return jax.jit(fn, donate_argnums=donate_argnums)
