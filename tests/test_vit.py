"""ViT family tests: shapes, param counts, KD interop through generic steps."""

import numpy as np
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.models.registry import (
    apply_model,
    spec_from_dict,
)
from inference_efficient_vision_models_tpu.models.vit import param_count


def test_vit_tiny_shapes_and_params():
    spec, params, state = create_model("vit_tiny_patch16_224", num_classes=6)
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    logits, st = apply_model(spec, params, state, x)
    assert logits.shape == (2, 6)
    # timm vit_tiny_patch16_224 @ 1000 classes is 5.72M; at 6 classes the
    # head shrinks by 994*(192+1)
    n = param_count(params)
    assert 5.4e6 < n < 5.6e6, n


def test_vit_spec_roundtrip_and_checkpoint(tmp_path):
    from inference_efficient_vision_models_tpu.core import artifacts

    spec, params, state = create_model("vit_tiny_patch16_224", num_classes=6)
    artifacts.save_checkpoint(str(tmp_path), "best", params, state, spec)
    sd = artifacts.load_spec_dict(str(tmp_path), "best")
    spec2 = spec_from_dict(sd)
    assert spec2 == spec


def test_vit_trains_and_kd_from_resnet(tmp_path):
    """Mixed-family KD: ResNet teacher → ViT student via the generic steps."""
    import logging

    from inference_efficient_vision_models_tpu.core import KDConfig
    from inference_efficient_vision_models_tpu.data import make_synthetic_neudet
    from inference_efficient_vision_models_tpu.train import train_classifier

    cfg = KDConfig(
        experiment_name="vitkd",
        artifacts_root=str(tmp_path),
        batch_size=8,
        epochs=1,
        image_size=(32, 32),
        compute_dtype="float32",
        synthetic_data=True,
        synthetic_size=48,
    )
    imgs, labels = make_synthetic_neudet(8, 32, seed=0)
    t_spec, t_params, t_state = create_model("resnet18", num_classes=6)
    # a tiny ViT for a 32x32 input
    from inference_efficient_vision_models_tpu.models.vit import ViTSpec, init

    s_spec = ViTSpec(
        name="vit_test", patch=8, dim=64, depth=2, heads=2, mlp_ratio=2.0,
        num_classes=6, image_size=32,
    )
    s_params, s_state = init(jax.random.PRNGKey(0), s_spec)
    params, state, hist = train_classifier(
        cfg, s_spec, s_params, s_state,
        (imgs, labels), (imgs[:16], labels[:16]),
        str(tmp_path / "fold_0"), logging.getLogger("vitkd"),
        teacher=(t_spec, t_params, t_state),
    )
    assert np.isfinite(hist["train_loss"]).all()


def test_vit_dynamic_int8_close_to_fp32():
    """Dynamic-int8 ViT tracks the fp32 model and serializes ~4x smaller."""
    import numpy as _np

    from inference_efficient_vision_models_tpu.compress.quant import qvit
    from inference_efficient_vision_models_tpu.metrics.profile import (
        model_size_bytes,
    )
    from inference_efficient_vision_models_tpu.models.vit import ViTSpec, init

    spec = ViTSpec(
        name="vit_test", patch=8, dim=128, depth=3, heads=4, mlp_ratio=2.0,
        num_classes=6, image_size=32,
    )
    params, state = init(jax.random.PRNGKey(1), spec)
    q = qvit.convert_dynamic_int8(spec, params)

    x = jnp.asarray(
        _np.random.default_rng(0).standard_normal((3, 32, 32, 3)), jnp.float32
    )
    ref, _ = apply_model(spec, params, state, x)
    got = qvit.apply_dynamic_int8(spec, q, x)
    _np.testing.assert_allclose(_np.asarray(got), _np.asarray(ref), rtol=0.15, atol=0.15)
    assert (_np.asarray(got).argmax(1) == _np.asarray(ref).argmax(1)).all()
    # dense weights dominate a ViT → int8 pytree much smaller
    assert model_size_bytes(q) < model_size_bytes(params) * 0.45
