"""Backend equivalence: apply_int8 with impl='im2col' (Pallas, interpret
mode on CPU) must match impl='lax' almost everywhere (1-ulp requant ties)."""

import logging

import numpy as np
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.compress.quant import qresnet
from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.data.pipeline import normalize_images
from inference_efficient_vision_models_tpu.models import create_model


class _Cfg:
    batch_size = 8
    calibration_images = 32
    DEBUG_MODE = False
    image_size = (64, 64)
    compute_dtype = "float32"


def test_im2col_impl_matches_lax():
    spec, params, state = create_model("resnet18", num_classes=6)
    cfg = _Cfg()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (32, 64, 64, 3)).astype(np.uint8)

    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    qmodel, _ = eng.static_quantize((imgs, np.zeros(32, np.int32)))

    x = jnp.asarray(imgs[:4])  # raw u8: stem carries the folded normalize
    ref = np.asarray(qresnet.apply_int8(spec, qmodel, x, impl="lax"))
    got = np.asarray(
        qresnet.apply_int8(spec, qmodel, x, impl="im2col", interpret=True)
    )
    # identical graph math up to 1-ulp requant rounding ties
    np.testing.assert_allclose(got, ref, rtol=0.02, atol=0.02)
    assert (got.argmax(1) == ref.argmax(1)).all()


def test_auto_impl_matches_lax():
    spec, params, state = create_model("resnet18", num_classes=6)
    cfg = _Cfg()
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (16, 64, 64, 3)).astype(np.uint8)
    eng = QuantizationEngine(cfg, spec, params, state, logging.getLogger("q"))
    qmodel, _ = eng.static_quantize((imgs, np.zeros(16, np.int32)))
    x = jnp.asarray(imgs[:4])
    ref = np.asarray(qresnet.apply_int8(spec, qmodel, x, impl="lax"))
    got = np.asarray(qresnet.apply_int8(spec, qmodel, x, impl="auto"))
    np.testing.assert_allclose(got, ref, rtol=0.02, atol=0.02)
    assert (got.argmax(1) == ref.argmax(1)).all()
