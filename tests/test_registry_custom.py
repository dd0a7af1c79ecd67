"""register_model: the user-extensible zoo passthrough (the rebuild's analog
of the reference's any-timm-name path, `teacher_training/utils.py:21-28` —
no timm exists in this stack, so extensibility is spec-parameterized custom
variants over the four family dataclasses, bound to names usable from every
stage CLI's ``model_name=``)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.models import (
    ResNetSpec,
    apply_model,
    create_model,
    register_model,
    registered_models,
)


def _narrow_resnet(num_classes: int = 6, in_chans: int = 3) -> ResNetSpec:
    """A custom half-width 10-layer ResNet no stock table contains."""
    depths = (1, 1, 1, 1)
    planes = (32, 64, 128, 256)
    return ResNetSpec(
        name="resnet10_narrow",
        block="basic",
        depths=depths,
        stage_widths=planes,
        inner_widths=tuple(((p,),) * d for d, p in zip(depths, planes)),
        stem_width=32,
        num_classes=num_classes,
        in_chans=in_chans,
    )


@pytest.fixture(autouse=True)
def _clean_registry():
    from inference_efficient_vision_models_tpu.models import registry

    saved = dict(registry._CUSTOM)
    yield
    registry._CUSTOM.clear()
    registry._CUSTOM.update(saved)


def test_registered_name_resolves_and_runs():
    register_model("resnet10_narrow", _narrow_resnet)
    assert "resnet10_narrow" in registered_models()
    spec, params, state = create_model("resnet10_narrow", num_classes=6)
    assert spec.stem_width == 32 and spec.stage_widths == (32, 64, 128, 256)
    x = jnp.asarray(np.zeros((2, 64, 64, 3), np.float32))
    logits, _ = apply_model(spec, params, state, x)
    assert logits.shape == (2, 6)


def test_registered_name_is_first_class_for_compression():
    """A registered custom variant goes through pruning AND static int8 —
    nothing in the compression stack keys on stock names."""
    from inference_efficient_vision_models_tpu.compress.prune import prune_model
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        quant_module,
        s2d_preprocess,
    )
    from inference_efficient_vision_models_tpu.data.pipeline import Batches

    register_model("resnet10_narrow", _narrow_resnet)
    spec, params, state = create_model("resnet10_narrow", num_classes=6)
    pspec, pparams, pstate = prune_model(
        spec, params, state, ratio=0.25, method="l2", round_to=8
    )
    assert sum(pspec.stage_widths) < sum(spec.stage_widths)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, 64, 64, 3)).astype(np.uint8)
    labels = rng.integers(0, 6, 8).astype(np.int32)
    qmod = quant_module(pspec)
    folded = qmod.fold(pspec, pparams, pstate)
    obs = qmod.calibrate(pspec, folded, Batches(imgs, labels, 8), max_images=8)
    qm = jax.tree.map(
        jnp.asarray, qmod.convert_static_int8(pspec, folded, obs, image_size=(64, 64))
    )
    out = np.asarray(qmod.apply_int8(pspec, qm, jnp.asarray(s2d_preprocess(imgs))))
    assert out.shape == (8, 6) and np.isfinite(out).all()


def test_duplicate_registration_guarded():
    register_model("resnet10_narrow", _narrow_resnet)
    with pytest.raises(ValueError):
        register_model("resnet10_narrow", _narrow_resnet)
    register_model("resnet10_narrow", _narrow_resnet, overwrite=True)
