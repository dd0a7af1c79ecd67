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


def _tiny_vit(seed=0, dim=64, depth=2, heads=4):
    from inference_efficient_vision_models_tpu.models.vit import ViTSpec, init

    spec = ViTSpec(
        name="vit_test", patch=8, dim=dim, depth=depth, heads=heads,
        mlp_ratio=4.0, num_classes=6, image_size=32,
    )
    params, state = init(jax.random.PRNGKey(seed), spec)
    return spec, params, state


def test_vit_torch_parity():
    """timm-style torch ViT weights → identical logits through the importer."""
    import torch

    from inference_efficient_vision_models_tpu.models.torch_import import (
        from_torch_state_dict_vit,
    )
    from inference_efficient_vision_models_tpu.models.vit import vit_spec, apply
    from tests.torch_ref import vit_tiny as torch_vit

    tm = torch_vit(num_classes=6, img_size=64).eval()
    spec = vit_spec("vit_tiny_patch16_224", num_classes=6, image_size=64)
    params, state = from_torch_state_dict_vit(spec, tm.state_dict())

    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got, _ = apply(spec, params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_vit_prune_heads_and_mlp_exact():
    """Zero whole heads + MLP channels, prune exactly those → identical logits."""
    from inference_efficient_vision_models_tpu.compress.prune.vit_engine import (
        apply_vit_pruning,
    )
    from inference_efficient_vision_models_tpu.models.vit import apply

    spec, params, state = _tiny_vit(seed=2)
    params = jax.device_get(params)
    hd = spec.head_dim
    rng = np.random.default_rng(0)

    keep = {}
    for i in range(spec.depth):
        blk = params["blocks"][str(i)]
        # kill one head: zero its qkv columns, qkv bias, and proj rows
        kill_h = int(rng.integers(0, spec.heads))
        keep[("heads", i)] = np.setdiff1d(np.arange(spec.heads), [kill_h])
        w = np.asarray(blk["qkv"]["w"]).reshape(spec.dim, 3, spec.heads, hd).copy()
        w[:, :, kill_h, :] = 0.0
        blk["qkv"]["w"] = w.reshape(spec.dim, -1)
        b = np.asarray(blk["qkv"]["b"]).reshape(3, spec.heads, hd).copy()
        b[:, kill_h, :] = 0.0
        blk["qkv"]["b"] = b.reshape(-1)
        pw = np.asarray(blk["proj"]["w"]).reshape(spec.heads, hd, spec.dim).copy()
        pw[kill_h] = 0.0
        blk["proj"]["w"] = pw.reshape(spec.heads * hd, spec.dim)
        # kill a third of MLP channels
        hidden = np.asarray(blk["mlp1"]["w"]).shape[1]
        kill_m = rng.choice(hidden, size=hidden // 3, replace=False)
        keep[("mlp", i)] = np.setdiff1d(np.arange(hidden), kill_m)
        w1 = np.asarray(blk["mlp1"]["w"]).copy(); w1[:, kill_m] = 0.0
        b1 = np.asarray(blk["mlp1"]["b"]).copy(); b1[kill_m] = 0.0
        w2 = np.asarray(blk["mlp2"]["w"]).copy(); w2[kill_m, :] = 0.0
        blk["mlp1"]["w"], blk["mlp1"]["b"], blk["mlp2"]["w"] = w1, b1, w2

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref, _ = apply(spec, params, state, x)

    new_spec, new_params = apply_vit_pruning(spec, params, keep)
    assert new_spec.head_counts == (spec.heads - 1,) * spec.depth
    got, _ = apply(new_spec, new_params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # NOTE on exactness: a zeroed head contributes softmax(0)·V = a weighted
    # average of ZERO value rows → exactly 0 through proj's zeroed rows; the
    # removed head changes nothing.


def test_vit_prune_model_dispatch_and_checkpoint(tmp_path):
    from inference_efficient_vision_models_tpu.compress.prune import prune_model
    from inference_efficient_vision_models_tpu.core import artifacts
    from inference_efficient_vision_models_tpu.models.vit import param_count

    spec, params, state = _tiny_vit(seed=3)
    n0 = param_count(params)
    new_spec, p2, s2 = prune_model(spec, params, state, ratio=0.25, method="l2", round_to=8)
    assert param_count(p2) < n0
    assert all(w % 8 == 0 for w in new_spec.mlp_hidden)
    artifacts.save_checkpoint(str(tmp_path), "best", p2, s2, new_spec)
    sd = artifacts.load_spec_dict(str(tmp_path), "best")
    assert spec_from_dict(sd) == new_spec


def test_vit_static_int8_and_artifact_roundtrip(tmp_path):
    """Stage-4 static int8 for ViT: engine dispatch, closeness, msgpack
    round-trip through the serving loader."""
    import logging
    import os

    from flax import serialization

    from inference_efficient_vision_models_tpu.compress.quant import qvit
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images

    class Cfg:
        batch_size = 8
        calibration_images = 32
        DEBUG_MODE = False
        image_size = (32, 32)
        compute_dtype = "float32"

    spec, params, state = _tiny_vit(seed=4)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (32, 32, 32, 3)).astype(np.uint8)
    eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
    assert eng.q is qvit
    qm, qfn = eng.static_quantize((imgs, np.zeros(32, np.int32)))

    ref = np.asarray(
        qvit.apply_folded(spec, eng.folded, normalize_images(jnp.asarray(imgs[:8])))
    )
    got = np.asarray(qfn(jnp.asarray(imgs[:8])))  # raw u8
    err = np.abs(got - ref) / (np.abs(ref).max() + 1e-6)
    assert err.max() < 0.25, err.max()
    assert (got.argmax(1) == ref.argmax(1)).mean() >= 0.75

    # round-trip through the stage-4 artifact format + serving loader
    import json

    from inference_efficient_vision_models_tpu.serving import load_quantized

    fold_dir = str(tmp_path)
    with open(os.path.join(fold_dir, "model_static_int8.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(qvit.serializable(jax.device_get(qm))))
    with open(os.path.join(fold_dir, "spec.json"), "w") as f:
        json.dump(spec.to_dict(), f)
    spec2, model2, fn2, pre = load_quantized(fold_dir, "static_int8")
    assert pre is None
    got2 = np.asarray(fn2(jnp.asarray(imgs[:4])))
    np.testing.assert_allclose(got2, got[:4], rtol=1e-5, atol=1e-5)


def test_vit_dynamic_int8_via_engine_and_serving(tmp_path):
    import json
    import logging
    import os

    from flax import serialization

    from inference_efficient_vision_models_tpu.compress.quant import qvit
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.serving import load_quantized

    class Cfg:
        batch_size = 8
        calibration_images = 16
        DEBUG_MODE = False
        image_size = (32, 32)
        compute_dtype = "float32"

    spec, params, state = _tiny_vit(seed=5)
    eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
    model, fn = eng.dynamic_quantize()
    imgs = np.random.default_rng(2).integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    ref = np.asarray(fn(jnp.asarray(imgs)))

    with open(os.path.join(str(tmp_path), "model_dynamic_int8.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(qvit.serializable(jax.device_get(model))))
    with open(os.path.join(str(tmp_path), "spec.json"), "w") as f:
        json.dump(spec.to_dict(), f)
    _, _, fn2, pre = load_quantized(str(tmp_path), "dynamic_int8")
    assert pre is None
    np.testing.assert_allclose(np.asarray(fn2(jnp.asarray(imgs))), ref, rtol=1e-5, atol=1e-5)


def test_vit_static_int8_bf16_executor(tmp_path):
    """The bf16-carrier executor runs the SAME int8 artifact: logits stay
    close to the fp32-carrier path (bf16 rounding only), argmax agrees, and
    the serving loader routes the ``static_int8_bf16`` method suffix to it
    (falling back to the base static_int8 msgpack)."""
    import json
    import logging
    import os

    from flax import serialization

    from inference_efficient_vision_models_tpu.compress.quant import qvit
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.serving import load_quantized

    class Cfg:
        batch_size = 8
        calibration_images = 32
        DEBUG_MODE = False
        image_size = (32, 32)
        compute_dtype = "float32"

    spec, params, state = _tiny_vit(seed=6)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (32, 32, 32, 3)).astype(np.uint8)
    eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
    qm, _ = eng.static_quantize((imgs, np.zeros(32, np.int32)))

    x = jnp.asarray(imgs[:8])  # raw u8 — the folded patch embed consumes it
    f32 = np.asarray(jax.jit(lambda q, x: qvit.apply_int8(spec, q, x))(qm, x))
    b16 = np.asarray(jax.jit(lambda q, x: qvit.apply_int8_bf16(spec, q, x))(qm, x))
    assert b16.dtype == np.float32  # logits come back fp32 either way
    err = np.abs(b16 - f32) / (np.abs(f32).max() + 1e-6)
    assert err.max() < 0.08, err.max()  # bf16 rounding, not a different model
    assert (b16.argmax(1) == f32.argmax(1)).all()

    # serving loader: "_bf16" suffix reuses the base static_int8 artifact
    with open(os.path.join(str(tmp_path), "model_static_int8.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(qvit.serializable(jax.device_get(qm))))
    with open(os.path.join(str(tmp_path), "spec.json"), "w") as f:
        json.dump(spec.to_dict(), f)
    _, _, fn2, pre = load_quantized(str(tmp_path), "static_int8_bf16")
    assert pre is None
    np.testing.assert_allclose(np.asarray(fn2(x)), b16, rtol=1e-5, atol=1e-5)


def test_vit_structured_pruning_engine_class():
    """Stage-3 CLI engine class on a ViT (regression: its post-prune log
    line assumed CNN spec fields and crashed the vt2 pipeline run with
    AttributeError: ViTSpec has no stem_width)."""
    import logging

    from inference_efficient_vision_models_tpu.compress.prune.engine import (
        StructuredPruningEngine,
    )

    class Cfg:
        pruning_ratio = 0.25
        pruning_method = "l2"
        global_pruning = False
        round_to = 8
        seed = 0
        finetune_epochs = 0

    spec, params, state = _tiny_vit(seed=9)
    eng = StructuredPruningEngine(Cfg(), spec, params, state, logging.getLogger("p"))
    pspec, pparams, _ = eng.prune_model()
    assert pspec.dim == spec.dim  # head/MLP pruning keeps the embed dim
    assert any(
        pparams["blocks"][str(i)]["mlp1"]["w"].shape[1]
        < spec.dim * int(spec.mlp_ratio)
        for i in range(spec.depth)
    )
