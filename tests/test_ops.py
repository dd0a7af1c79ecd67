"""Pallas int8 kernel tests (interpret mode on the CPU backend) against a
numpy reference of the exact quantized semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.ops import (
    conv_int8_im2col,
    int8_matmul_requant,
)


def _ref_matmul(x_s, w_q, w_scale, bias, in_scale, in_zp, relu, out_scale, out_zp):
    zp_s = in_zp - 128
    acc = x_s.astype(np.int32) @ w_q.astype(np.int32)
    acc = acc - zp_s * w_q.astype(np.int32).sum(axis=0)
    y = acc.astype(np.float32) * (in_scale * w_scale) + bias
    if relu:
        y = np.maximum(y, 0.0)
    if out_scale is None:
        return y
    q = np.round(y / out_scale) + out_zp
    return (np.clip(q, 0, 255) - 128).astype(np.int8)


@pytest.mark.parametrize("relu,requant", [(False, False), (True, True), (False, True)])
def test_int8_matmul_requant_matches_reference(relu, requant):
    rng = np.random.default_rng(0)
    M, K, N = 96, 72, 160
    x_s = rng.integers(-128, 128, (M, K), dtype=np.int8)
    w_q = rng.integers(-128, 128, (K, N), dtype=np.int8)
    w_scale = rng.uniform(0.001, 0.01, N).astype(np.float32)
    bias = rng.standard_normal(N).astype(np.float32)
    w_sum = w_q.astype(np.int32).sum(axis=0)
    in_scale, in_zp = 0.05, 13
    out_scale, out_zp = (0.07, 122) if requant else (None, None)

    got = np.asarray(int8_matmul_requant(
        jnp.asarray(x_s), jnp.asarray(w_q),
        jnp.asarray(w_scale), jnp.asarray(bias), jnp.asarray(w_sum),
        in_scale=in_scale, in_zp=in_zp, relu=relu,
        out_scale=out_scale, out_zp=out_zp,
        block_m=32, block_n=128, interpret=True,
    ))
    ref = _ref_matmul(x_s, w_q, w_scale, bias, in_scale, in_zp, relu, out_scale, out_zp)
    if requant:
        # rounding at the int8 boundary may differ by 1 ulp on ties
        assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1
        assert (got == ref).mean() > 0.99
    else:
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("out_dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("act", [None, "gelu"])
def test_int8_matmul_fused_quantize_input(act, out_dtype):
    """Float activations: the kernel quantizes per tile in VMEM
    (quantize_affine_shifted semantics) before the int8 dot; optional
    erf-GELU epilogue (A&S 7.1.26 poly, max err 5e-7 — below the bf16
    resolution of the carrier). Ragged non-128-multiple dims exercised."""
    import jax

    from inference_efficient_vision_models_tpu.compress.quant.observers import (
        quantize_affine_shifted,
    )

    rng = np.random.default_rng(1)
    M, K, N = 70, 72, 168
    x = rng.standard_normal((M, K)).astype(np.float32)
    w_q = rng.integers(-128, 128, (K, N), dtype=np.int8)
    w_scale = rng.uniform(0.001, 0.01, N).astype(np.float32)
    bias = rng.standard_normal(N).astype(np.float32)
    w_sum = w_q.astype(np.int32).sum(axis=0)
    in_scale, in_zp = 0.031, 119

    got = np.asarray(int8_matmul_requant(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w_q),
        jnp.asarray(w_scale), jnp.asarray(bias), jnp.asarray(w_sum),
        in_scale=in_scale, in_zp=in_zp, act=act, out_dtype=out_dtype,
        block_m=32, block_n=128, interpret=True,
    )).astype(np.float32)
    assert got.dtype == np.float32

    x_s = np.asarray(quantize_affine_shifted(
        jnp.asarray(x, jnp.bfloat16), in_scale, in_zp))
    ref = _ref_matmul(x_s, w_q, w_scale, bias, in_scale, in_zp, False, None, None)
    if act == "gelu":
        ref = np.asarray(jax.nn.gelu(jnp.asarray(ref), approximate=False))
    ref = np.asarray(jnp.asarray(ref).astype(out_dtype)).astype(np.float32)
    atol = 2e-2 if out_dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(got, ref, rtol=1e-2 if act else 1e-5, atol=atol)


def test_fused_dense_gelu_fallback(monkeypatch):
    """ops/fused_dense: off-TPU the op is exactly gelu(x @ w + b); the
    IEVM_FUSED_DENSE override is honored (0 forces the XLA composition
    even on TPU — 1 would force Pallas, untestable on the CPU backend)."""
    import jax

    from inference_efficient_vision_models_tpu.ops import fused_dense

    monkeypatch.setenv("IEVM_FUSED_DENSE", "0")
    assert not fused_dense.use_fused_dense()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 7, 40)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((40, 24)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(24), jnp.float32)
    got = fused_dense.dense_gelu(x, w, b)
    ref = jax.nn.gelu(x @ w + b, approximate=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)
    monkeypatch.setenv("IEVM_FUSED_DENSE", "1")
    assert fused_dense.use_fused_dense()


def test_erf_poly_accuracy():
    """The in-kernel A&S 7.1.26 erf stays within 1e-6 of lax.erf across the
    GELU-relevant range (bf16 resolution is ~4e-3 relative)."""
    from jax import lax

    from inference_efficient_vision_models_tpu.ops.int8_matmul import _erf

    x = jnp.asarray(np.linspace(-8, 8, 100001), jnp.float32)
    d = np.abs(np.asarray(_erf(x)) - np.asarray(lax.erf(x)))
    assert d.max() < 1e-6, d.max()


@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 1, 3), (1, 0, 1), (2, 0, 1)])
def test_conv_im2col_matches_qresnet_conv(stride, padding, k):
    """im2col int8 conv ≡ the lax-conv int8 path in qresnet."""
    from inference_efficient_vision_models_tpu.compress.quant.qresnet import (
        _epilogue,
        _qconv_int8,
    )

    rng = np.random.default_rng(1)
    x_s = rng.integers(-128, 128, (2, 14, 14, 32), dtype=np.int8)
    w_q = rng.integers(-128, 128, (k, k, 32, 64), dtype=np.int8)
    qc = {
        "w_q": jnp.asarray(w_q),
        "w_scale": jnp.asarray(rng.uniform(0.001, 0.01, 64).astype(np.float32)),
        "w_sum": jnp.asarray(w_q.astype(np.int32).sum(axis=(0, 1, 2))),
        "bias": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
    }
    in_scale, in_zp = np.float32(0.04), np.int32(140)

    acc = _qconv_int8(jnp.asarray(x_s), in_zp, qc, stride, padding)
    ref = np.asarray(_epilogue(acc, in_scale, qc, relu=True))

    got = np.asarray(conv_int8_im2col(
        jnp.asarray(x_s), qc["w_q"], qc["w_scale"], qc["bias"], qc["w_sum"],
        stride=stride, padding=padding,
        in_scale=float(in_scale), in_zp=int(in_zp), relu=True,
        out_scale=None, out_zp=None, interpret=True,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)


def test_conv3x3_s1_pallas_matches_lax():
    """Fused direct 3x3 Pallas conv ≡ the lax int8 path (interpret mode)."""
    from inference_efficient_vision_models_tpu.compress.quant.qresnet import (
        _epilogue,
        _qconv_int8,
        _requant,
    )
    from inference_efficient_vision_models_tpu.ops import conv3x3_s1_int8

    rng = np.random.default_rng(2)
    x_s = rng.integers(-128, 128, (2, 12, 14, 32), dtype=np.int8)
    w_q = rng.integers(-128, 128, (3, 3, 32, 72), dtype=np.int8)
    qc = {
        "w_q": jnp.asarray(w_q),
        "w_scale": jnp.asarray(rng.uniform(0.001, 0.01, 72).astype(np.float32)),
        "w_sum": jnp.asarray(w_q.astype(np.int32).sum(axis=(0, 1, 2))),
        "bias": jnp.asarray(rng.standard_normal(72).astype(np.float32)),
    }
    in_scale, in_zp = 0.03, 150
    for requant in (False, True):
        out_scale, out_zp = (0.05, 110) if requant else (None, None)
        acc = _qconv_int8(jnp.asarray(x_s), jnp.asarray(in_zp), qc, 1, 1)
        ref = _epilogue(acc, jnp.asarray(in_scale), qc, relu=True)
        if requant:
            ref = _requant(ref, out_scale, out_zp)
        got = conv3x3_s1_int8(
            jnp.asarray(x_s), qc["w_q"], qc["w_scale"], qc["bias"], qc["w_sum"],
            in_scale=in_scale, in_zp=in_zp, relu=True,
            out_scale=out_scale, out_zp=out_zp, interpret=True,
        )
        if requant:
            d = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
            assert d.max() <= 1 and (d == 0).mean() > 0.99
        else:
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-3)


def test_s2d_stem_path_matches_fullres_int8():
    """Static-int8 apply via s2d input ≡ full-res input (same quantized
    values, different summation order; 1-ulp requant ties tolerated)."""
    import logging

    from inference_efficient_vision_models_tpu.compress.quant import qresnet
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    class Cfg:
        batch_size = 8
        calibration_images = 16
        DEBUG_MODE = False
        image_size = (64, 64)
        compute_dtype = "float32"

    spec, params, state = create_model("resnet18", num_classes=6)
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (16, 64, 64, 3)).astype(np.uint8)
    eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
    qmodel, q_fn = eng.static_quantize((imgs, np.zeros(16, np.int32)))

    full = np.asarray(q_fn(jnp.asarray(imgs[:4])))
    s2d = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(imgs[:4]))))
    np.testing.assert_allclose(s2d, full, rtol=0.02, atol=0.02)
    assert (s2d.argmax(1) == full.argmax(1)).all()


@pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (5, 1), (5, 2)])
def test_depthwise_int8_shifts_exact(k, stride):
    """Shift-multiply depthwise int8 (ops/dwconv_int8) is bit-identical to
    the grouped-conv formulation — integer arithmetic, no tolerance."""
    from jax import lax

    from inference_efficient_vision_models_tpu.ops.dwconv_int8 import (
        depthwise_conv_int8,
    )

    rng = np.random.default_rng(11)
    c = 24
    x = jnp.asarray(rng.integers(-128, 128, (2, 17, 17, c)).astype(np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (k, k, 1, c)).astype(np.int8))
    want = lax.conv_general_dilated(
        x, w, (stride, stride), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.int32,
    )
    got = depthwise_conv_int8(x, w, stride)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_space_to_depth_device_matches_host():
    import jax

    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_device,
        space_to_depth_u8,
    )

    rng = np.random.default_rng(11)
    x = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    got = np.asarray(jax.jit(space_to_depth_device)(jnp.asarray(x)))
    np.testing.assert_array_equal(got, space_to_depth_u8(x))


def test_apply_int8_raw_input_uses_device_s2d_exactly():
    """Raw uint8 into apply_int8 with an e4 stem must be BIT-identical to
    host-s2d input: both run the same e4 program, only the relayout moves
    on device (the zero-host-preprocess serving mode)."""
    import logging

    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    class Cfg:
        batch_size = 8
        calibration_images = 16
        DEBUG_MODE = False
        image_size = (64, 64)
        compute_dtype = "float32"

    spec, params, state = create_model("resnet18", num_classes=6)
    rng = np.random.default_rng(13)
    imgs = rng.integers(0, 255, (16, 64, 64, 3)).astype(np.uint8)
    eng = QuantizationEngine(Cfg(), spec, params, state, logging.getLogger("q"))
    qmodel, q_fn = eng.static_quantize((imgs, np.zeros(16, np.int32)))
    raw = np.asarray(q_fn(jnp.asarray(imgs[:4])))
    hosted = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(imgs[:4]))))
    np.testing.assert_array_equal(raw, hosted)


def test_remap_conv_weights_s2d_matches_specialized_stem_remap():
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        remap_conv_weights_s2d,
        remap_stem_weights_s2d,
    )

    rng = np.random.default_rng(17)
    w = rng.standard_normal((7, 7, 3, 8)).astype(np.float32)
    w4, pad_lo, s2 = remap_conv_weights_s2d(w, stride=2, pad=3)
    assert (pad_lo, s2) == (2, 1)
    np.testing.assert_array_equal(w4, remap_stem_weights_s2d(w))
    # 3x3/s2 pad1 (the MBConv stem geometry): 2x2/s1 with left pad 1
    w3 = rng.standard_normal((3, 3, 3, 8)).astype(np.float32)
    w32, pad_lo3, s23 = remap_conv_weights_s2d(w3, stride=2, pad=1)
    assert w32.shape == (2, 2, 12, 8) and (pad_lo3, s23) == (1, 1)


def test_int8_mlp_pair_fused_matches_unfused():
    """qvit._mlp_pair_fused semantics: mlp1 requantizes its GELU output
    directly at mlp2's input qparams (int8 intermediate in HBM). Must match
    the unfused chain (dequant fp32 → re-quantize in mlp2) to within the
    one-ulp rounding of the shared int8 boundary."""
    rng = np.random.default_rng(7)
    M, D, H = 64, 96, 192  # tokens, dim, hidden
    z = rng.standard_normal((M, D)).astype(np.float32)

    def qd(k, n, seed):
        r = np.random.default_rng(seed)
        return {
            "w_q": r.integers(-128, 128, (k, n), dtype=np.int8),
            "w_scale": r.uniform(0.001, 0.01, n).astype(np.float32),
            "b": r.standard_normal(n).astype(np.float32),
            "in_scale": np.float32(0.04), "in_zp": np.int32(120),
        }

    qd1, qd2 = qd(D, H, 1), qd(H, D, 2)
    for d in (qd1, qd2):
        d["w_sum"] = d["w_q"].astype(np.int32).sum(axis=0)

    kw = dict(block_m=32, block_n=128, interpret=True)
    # fused: mlp1 emits shifted-int8 at mlp2's input qparams
    z8 = int8_matmul_requant(
        jnp.asarray(z), jnp.asarray(qd1["w_q"]), jnp.asarray(qd1["w_scale"]),
        jnp.asarray(qd1["b"]), jnp.asarray(qd1["w_sum"]),
        in_scale=qd1["in_scale"], in_zp=qd1["in_zp"], act="gelu",
        out_scale=qd2["in_scale"], out_zp=qd2["in_zp"], **kw,
    )
    fused = np.asarray(int8_matmul_requant(
        z8, jnp.asarray(qd2["w_q"]), jnp.asarray(qd2["w_scale"]),
        jnp.asarray(qd2["b"]), jnp.asarray(qd2["w_sum"]),
        in_scale=qd2["in_scale"], in_zp=qd2["in_zp"], **kw,
    ))

    # unfused: mlp1 dequantizes to fp32, mlp2 quantizes in-kernel
    y1 = np.asarray(int8_matmul_requant(
        jnp.asarray(z), jnp.asarray(qd1["w_q"]), jnp.asarray(qd1["w_scale"]),
        jnp.asarray(qd1["b"]), jnp.asarray(qd1["w_sum"]),
        in_scale=qd1["in_scale"], in_zp=qd1["in_zp"], act="gelu", **kw,
    ))
    unfused = np.asarray(int8_matmul_requant(
        jnp.asarray(y1), jnp.asarray(qd2["w_q"]), jnp.asarray(qd2["w_scale"]),
        jnp.asarray(qd2["b"]), jnp.asarray(qd2["w_sum"]),
        in_scale=qd2["in_scale"], in_zp=qd2["in_zp"], **kw,
    ))
    # identical up to one-ulp ties at the shared int8 re-quantization
    tol = float(qd2["in_scale"]) * np.abs(qd2["w_q"].astype(np.int32)).sum(0).max() \
        * qd2["w_scale"].max()
    assert np.abs(fused - unfused).max() <= tol, (np.abs(fused - unfused).max(), tol)
    assert np.square(fused - unfused).mean() < np.square(unfused).mean() * 1e-3
