"""Device-side augmentation (data/augment.py): determinism, label-safety
mechanics, and train-step integration."""

import numpy as np
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.data.augment import (
    augment_images,
    make_augment_fn,
)


def _imgs(n=8, s=32, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 255, (n, s, s, 3)).astype(np.uint8)
    )


def test_deterministic_and_shape_preserving():
    x = _imgs()
    k = jax.random.PRNGKey(7)
    a1 = np.asarray(augment_images(k, x))
    a2 = np.asarray(augment_images(k, x))
    np.testing.assert_array_equal(a1, a2)
    assert a1.shape == x.shape and a1.dtype == np.uint8
    a3 = np.asarray(augment_images(jax.random.PRNGKey(8), x))
    assert (a1 != a3).any()  # different key → different stream


def test_identity_when_all_off():
    x = _imgs()
    out = augment_images(jax.random.PRNGKey(0), x, crop_pad=0, flip=False,
                         brightness=0.0, contrast=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_flip_only_is_exact_flip_or_identity():
    x = _imgs(n=16)
    out = np.asarray(augment_images(jax.random.PRNGKey(3), x, crop_pad=0,
                                    flip=True, brightness=0.0, contrast=0.0))
    xn = np.asarray(x)
    flipped = identity = 0
    for i in range(len(xn)):
        if (out[i] == xn[i]).all():
            identity += 1
        elif (out[i] == xn[i][:, ::-1, :]).all():
            flipped += 1
        else:
            raise AssertionError(f"image {i} is neither identity nor h-flip")
    assert flipped > 0 and identity > 0  # p=0.5 over 16 images


def test_rot180_only():
    x = _imgs(n=16)
    out = np.asarray(augment_images(jax.random.PRNGKey(4), x, crop_pad=0,
                                    flip=False, rot180=True,
                                    brightness=0.0, contrast=0.0))
    xn = np.asarray(x)
    rotated = sum(
        (out[i] == xn[i][::-1, ::-1, :]).all() and not (out[i] == xn[i]).all()
        for i in range(len(xn))
    )
    assert rotated > 0


def test_crop_translates_content():
    """Pure crop: every output must equal SOME translation of the edge-padded
    input (checked via the brightest-pixel displacement bound)."""
    x = _imgs(n=4, s=24)
    p = 4
    out = np.asarray(augment_images(jax.random.PRNGKey(5), x, crop_pad=p,
                                    flip=False, brightness=0.0, contrast=0.0))
    xn = np.asarray(x).astype(np.int32)
    pad = np.pad(xn, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    for i in range(len(xn)):
        matches = [
            (out[i] == pad[i, oy : oy + 24, ox : ox + 24]).all()
            for oy in range(2 * p + 1)
            for ox in range(2 * p + 1)
        ]
        assert any(matches), f"image {i}: no translation reproduces the crop"


def test_illum_gradient_is_planar_field():
    """Pure illumination jitter: per-image residual must be an exact plane
    (up to u8 rounding/clipping) — corner-to-corner consistent."""
    x = jnp.full((4, 16, 16, 3), 128, jnp.uint8)
    out = np.asarray(augment_images(jax.random.PRNGKey(9), x, crop_pad=0,
                                    flip=False, brightness=0.0, contrast=0.0,
                                    illum_gradient=0.3)).astype(np.float32)
    assert (out != 128).any()  # field applied
    for i in range(4):
        r = out[i, :, :, 0] - 128.0
        # fit a plane via least squares; residual ≤ rounding error
        yy, xx = np.mgrid[0:16, 0:16]
        A = np.stack([xx.ravel(), yy.ravel(), np.ones(256)], 1)
        coef, *_ = np.linalg.lstsq(A, r.ravel(), rcond=None)
        resid = np.abs(A @ coef - r.ravel()).max()
        assert resid <= 1.0, resid  # u8 rounding only
        # channels identical (illumination is achromatic)
        np.testing.assert_array_equal(out[i, :, :, 0], out[i, :, :, 1])


def test_make_augment_fn_respects_config():
    class Cfg:
        augment = False

    assert make_augment_fn(Cfg()) is None

    class Cfg2:
        augment = True
        augment_flip = False
        augment_rot180 = True
        augment_crop_pad = 2
        augment_brightness = 0.0
        augment_contrast = 0.0

    fn = make_augment_fn(Cfg2())
    x = _imgs(n=4, s=16)
    out = fn(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape


def test_train_step_with_augmentation_runs_and_learns_shapewise():
    """make_train_step(augment_fn=...) compiles (augment traced into the one
    XLA program) and updates params; determinism across re-runs."""
    from inference_efficient_vision_models_tpu.models import create_model, resnet
    from inference_efficient_vision_models_tpu.train.optim import adamw_init
    from inference_efficient_vision_models_tpu.train.steps import make_train_step

    spec, params, state = create_model("resnet18", num_classes=6)
    import dataclasses

    spec = dataclasses.replace(spec, stem_width=8, stage_widths=(8, 8, 8, 8),
                               inner_widths=(((8,), (8,)),) * 4)
    params, state = resnet.init(jax.random.PRNGKey(0), spec)

    class Cfg:
        augment = True
        augment_flip = True
        augment_rot180 = False
        augment_crop_pad = 4
        augment_brightness = 0.1
        augment_contrast = 0.1

    fn = make_augment_fn(Cfg())
    step = make_train_step(spec, learning_rate=1e-3, compute_dtype="float32",
                           augment_fn=fn, augment_seed=0)
    rng = np.random.default_rng(1)
    batch = (
        jnp.asarray(rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)),
        jnp.asarray(rng.integers(0, 6, 8).astype(np.int32)),
        jnp.ones(8, jnp.float32),
    )

    def run():
        p, s = jax.device_get((params, state))
        opt = adamw_init(p)
        p2, s2, opt2, m = step(p, s, opt, batch)
        return jax.device_get((p2, m["loss"]))

    (p_a, loss_a), (p_b, loss_b) = run(), run()
    assert np.isfinite(float(loss_a))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=0, atol=0)
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        p_a, jax.device_get(params))
    assert max(jax.tree.leaves(moved)) > 0
