"""Device-side train-time augmentation.

The reference pipeline has NO augmentation (its transform stack is
Resize→ToTensor→Normalize only, `teacher_training/dataset.py:14-21`), which
this rebuild preserved for parity. That choice is what makes from-scratch
MBConv students collapse under the hard surrogate's train→test illumination
shift (REPORT.md round-4: EfficientNet-B0 6.8% shifted-test at 40% val) —
memorizable shortcuts transfer for ResNets but not for the
low-capacity-per-param MBConv families. ``augment=True`` (VERDICT r4 task 6)
adds the standard invariance package as ONE jittable transform applied
inside the train step, so it fuses into the step's XLA program (no host
work, no extra transfers):

  * random horizontal flip (``augment_flip``) — label-safe for NEU-DET
    defect textures, but NOT for the hard surrogate's orientation classes
    (either flip maps a grating at θ to π−θ, i.e. class orient=k to
    n_orient−k — label-destroying). The hard-task A/Bs set
    ``augment_flip=False``; 180° rotation (h+v flip) IS orientation-safe
    and is what ``augment_rot180`` provides for those runs.
  * random crop via edge-pad + per-image dynamic_slice (static shapes;
    translation invariance)
  * brightness + contrast jitter         (directly counters the shifted
                                          illumination-gradient range and
                                          contrast jitter of the test split)

Everything is keyed per (seed, step): two runs with the same config see
identical augmentation streams (core/prng.py discipline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def augment_images(
    key,
    imgs_u8,
    *,
    crop_pad: int = 16,
    flip: bool = True,
    rot180: bool = False,
    brightness: float = 0.15,
    contrast: float = 0.2,
    illum_gradient: float = 0.0,
    noise: float = 0.0,
):
    """uint8 NHWC → augmented uint8 NHWC. Jittable, static output shape.

    Runs in float32 internally (the VPU cost is negligible next to the
    model's matmuls) and rounds back to uint8 so the downstream
    ``normalize_images`` contract is unchanged."""
    n, h, w, c = imgs_u8.shape
    kf, kx, ky, kb, kc = jax.random.split(key, 5)
    x = imgs_u8.astype(jnp.float32)
    if flip:
        do = jax.random.bernoulli(kf, 0.5, (n,))
        x = jnp.where(do[:, None, None, None], x[:, :, ::-1, :], x)
    elif rot180:
        do = jax.random.bernoulli(kf, 0.5, (n,))
        x = jnp.where(do[:, None, None, None], x[:, ::-1, ::-1, :], x)
    if crop_pad:
        p = int(crop_pad)
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        oy = jax.random.randint(ky, (n,), 0, 2 * p + 1)
        ox = jax.random.randint(kx, (n,), 0, 2 * p + 1)
        x = jax.vmap(
            lambda img, oy_, ox_: jax.lax.dynamic_slice(
                img, (oy_, ox_, 0), (h, w, c)
            )
        )(xp, oy, ox)
    if brightness:
        delta = jax.random.uniform(
            kb, (n, 1, 1, 1), minval=-brightness, maxval=brightness
        ) * 255.0
        x = x + delta
    if contrast:
        fac = jax.random.uniform(
            kc, (n, 1, 1, 1), minval=1.0 - contrast, maxval=1.0 + contrast
        )
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        x = (x - mean) * fac + mean
    if illum_gradient:
        # random planar illumination field ga·(x/W−½)+gb·(y/H−½), the
        # nuisance whose RANGE shifts between the hard surrogate's train
        # and test splits (data/synthetic.py:_hard_texture) — jittering it
        # at train time spans the test range instead of memorizing the
        # train one. ga/gb in units of full-scale (×255).
        kg = jax.random.fold_in(kc, 1)
        g = jax.random.uniform(
            kg, (n, 2, 1, 1, 1), minval=-illum_gradient, maxval=illum_gradient
        ) * 255.0
        yy = (jnp.arange(h, dtype=jnp.float32) / h - 0.5)[None, :, None, None]
        xx = (jnp.arange(w, dtype=jnp.float32) / w - 0.5)[None, None, :, None]
        x = x + g[:, 0] * xx + g[:, 1] * yy
    if noise:
        # achromatic gaussian pixel noise with a per-image σ ~ U(0, noise)
        # (fractions of full scale) — the hard surrogate's test split raises
        # its sensor-noise σ beyond the train range; jittering σ at train
        # time covers it
        kn = jax.random.fold_in(kb, 1)
        sig = jax.random.uniform(kn, (n, 1, 1, 1), maxval=noise) * 255.0
        x = x + sig * jax.random.normal(jax.random.fold_in(kn, 2), (n, h, w, 1))
    return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)


def make_augment_fn(cfg):
    """cfg → ``fn(key, imgs_u8)`` or None when ``cfg.augment`` is falsy."""
    if not getattr(cfg, "augment", False):
        return None
    crop_pad = int(getattr(cfg, "augment_crop_pad", 16))
    flip = bool(getattr(cfg, "augment_flip", True))
    rot180 = bool(getattr(cfg, "augment_rot180", False))
    brightness = float(getattr(cfg, "augment_brightness", 0.15))
    contrast = float(getattr(cfg, "augment_contrast", 0.2))
    illum = float(getattr(cfg, "augment_illum_gradient", 0.0))
    noise = float(getattr(cfg, "augment_noise", 0.0))

    def fn(key, imgs_u8):
        return augment_images(
            key, imgs_u8, crop_pad=crop_pad, flip=flip, rot180=rot180,
            brightness=brightness, contrast=contrast, illum_gradient=illum,
            noise=noise,
        )

    return fn
