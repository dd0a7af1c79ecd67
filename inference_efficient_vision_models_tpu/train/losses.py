"""Loss math (fractions internally; formatting happens at the CLI edge).

The KD loss reproduces the reference exactly
(`knowledge_distillation/train.py:47-57`):

    loss = (1-α)·CE(student_logits, y)
         + α·KL( log_softmax(s/T) ‖ softmax(t/T) )·T²

with KL reduced "batchmean" (sum over classes, mean over batch) like
``nn.KLDivLoss(reduction="batchmean")`` (`knowledge_distillation/main.py:129`).

All losses take a validity ``mask`` so padded static-shape batches
(data/pipeline.py) contribute nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(per_sample, mask):
    mask = mask.astype(jnp.float32)
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy(logits, labels, mask=None):
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if mask is None:
        return jnp.mean(nll)
    return _masked_mean(nll, mask)


def kl_divergence_batchmean(student_logp, teacher_p, mask=None):
    """KL(teacher ‖ student) summed over classes, averaged over batch —
    torch KLDivLoss(batchmean) semantics with target=teacher probs."""
    teacher_logp = jnp.log(jnp.clip(teacher_p, 1e-12))
    per_sample = jnp.sum(teacher_p * (teacher_logp - student_logp), axis=-1)
    if mask is None:
        return jnp.mean(per_sample)
    return _masked_mean(per_sample, mask)


def kd_loss(student_logits, teacher_logits, labels, *, alpha, temperature, mask=None):
    """Returns (total, ce_part, kd_part)."""
    s = student_logits.astype(jnp.float32)
    t = teacher_logits.astype(jnp.float32)
    ce = cross_entropy(s, labels, mask)
    student_logp = jax.nn.log_softmax(s / temperature, axis=-1)
    teacher_p = jax.nn.softmax(t / temperature, axis=-1)
    kd = kl_divergence_batchmean(student_logp, teacher_p, mask) * (temperature**2)
    total = (1.0 - alpha) * ce + alpha * kd
    return total, ce, kd


def sp_kd_loss(student_feats, teacher_feats, mask=None):
    """Similarity-preserving feature distillation (Tung & Mori, ICCV 2019).

    Beyond the reference's logit-only KD: the student matches the *batch
    similarity structure* of the teacher's penultimate features — the
    row-L2-normalized Gram matrices G = f·fᵀ agree in Frobenius norm,
    ``loss = ||G̃_s − G̃_t||²_F / B²``. Relational, so it is parameter- and
    dimension-free: heterogeneous pairs (ResNet50 → MobileNetV2, ViT-S →
    ViT-Tiny) need no learned projection head, which keeps the KD stage's
    artifact contract unchanged (student params only).

    Masked (padded) rows are zeroed in both Grams and the divisor uses the
    valid count, so static-shape padded batches contribute nothing.
    """
    f_s = student_feats.astype(jnp.float32)
    f_t = jax.lax.stop_gradient(teacher_feats.astype(jnp.float32))
    if mask is not None:
        m = mask.astype(jnp.float32)[:, None]
        f_s = f_s * m
        f_t = f_t * m
        b = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    else:
        b = jnp.float32(f_s.shape[0])

    def norm_gram(f):
        g = f @ f.T
        return g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-12)

    return jnp.sum((norm_gram(f_s) - norm_gram(f_t)) ** 2) / (b * b)


def masked_accuracy(logits, labels, mask=None):
    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    if mask is None:
        return jnp.mean(correct)
    return _masked_mean(correct, mask)
