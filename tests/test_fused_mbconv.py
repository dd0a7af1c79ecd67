"""Fused whole-block int8 MBConv kernel (ops/fused_mbconv + fusedpath):
block-level and whole-model equivalence against the unfused apply_int8
op chain, in Pallas interpret mode on the CPU backend."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.compress.quant import fusedpath
from inference_efficient_vision_models_tpu.compress.quant.engine import quant_module
from inference_efficient_vision_models_tpu.data.pipeline import Batches
from inference_efficient_vision_models_tpu.models import create_model


def _toy_imgs(n=8, size=64, seed=3):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 6, n).astype(np.int32)
    base = (labels * 40 + 20)[:, None, None, None]
    return (
        np.clip(base + rng.normal(0, 12, (n, size, size, 3)), 0, 255).astype(np.uint8),
        labels,
    )


def _quantized(model_name, imgs, labels):
    spec, params, state = create_model(model_name, num_classes=6)
    qmod = quant_module(spec)
    folded = qmod.fold(spec, params, state)
    observers = qmod.calibrate(spec, folded, Batches(imgs, labels, 8), max_images=16)
    qmodel = qmod.convert_static_int8(
        spec, folded, observers, image_size=imgs.shape[1:3]
    )
    return spec, qmod, jax.tree.map(jnp.asarray, qmodel)


@pytest.mark.parametrize("model_name", ["efficientnet_b0", "mobilenet_v2_050"])
def test_fused_whole_model_matches_unfused(model_name):
    """apply_int8_fused logits ≈ apply_int8 logits (same quant grid; only
    f32 reduction order may differ → sub-quantum logit wiggle)."""
    imgs, labels = _toy_imgs()
    spec, qmod, qmodel = _quantized(model_name, imgs, labels)
    x = jnp.asarray(imgs)

    ref = np.asarray(qmod.apply_int8(spec, qmodel, x))
    qf = fusedpath.pack_fused(spec, qmodel)
    got = np.asarray(fusedpath.apply_int8_fused(spec, qmodel, qf, x, interpret=True))

    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, atol=0.3, rtol=0.02)
    agree = (got.argmax(1) == ref.argmax(1)).mean()
    assert agree >= 0.85, agree


def test_fused_single_block_within_one_quantum():
    """One fused EfficientNet block's int8 output equals the unfused op
    chain within ±1 quantization step at every position."""
    from inference_efficient_vision_models_tpu.compress.quant import qeffnet
    from inference_efficient_vision_models_tpu.compress.quant.observers import (
        dequantize_affine_shifted,
    )
    from inference_efficient_vision_models_tpu.ops.fused_mbconv import (
        fused_mbconv_block,
    )

    imgs, labels = _toy_imgs()
    spec, qmod, qmodel = _quantized("efficientnet_b0", imgs, labels)

    # stage1 block1: expand + SE + residual, stride 1 (the richest shape)
    s, b = 1, 1
    assert spec.has_residual(s, b)
    blk = qmodel[f"stage{s}"][str(b)]
    prev = qmodel[f"stage{s}"]["0"]
    in_s, in_z = prev["out_scale"], prev["out_zp"]

    # a realistic int8 input tensor: run the unfused net up to this block
    x = jnp.asarray(imgs)
    stem = qmodel["stem"]
    from inference_efficient_vision_models_tpu.compress.quant import stemfold

    y = stemfold.apply_u8_stem(stem, x, stride=2, pad=1, act="silu")
    cur = qeffnet._requant(y, stem["out_scale"], stem["out_zp"])
    cur_s, cur_z = stem["out_scale"], stem["out_zp"]
    for ss, bb in [(0, 0), (1, 0)]:
        blk_ = qmodel[f"stage{ss}"][str(bb)]
        stride_ = spec.block_stride(ss, bb)
        k_ = spec.stage_kernels[ss]
        h, h_s, h_z = cur, cur_s, cur_z
        if "expand" in blk_:
            h = qeffnet._conv_q(h, h_z, h_s, blk_["expand"], 1, 0, act=True, requant=True)
            h_s, h_z = blk_["expand"]["out_scale"], blk_["expand"]["out_zp"]
        h = qeffnet._conv_q(
            h, h_z, h_s, blk_["dw"], stride_, (k_ - 1) // 2,
            groups=int(blk_["dw"]["w_q"].shape[3]), act=True, requant=True,
        )
        h_s, h_z = blk_["dw"]["out_scale"], blk_["dw"]["out_zp"]
        h_f = dequantize_affine_shifted(h, h_s, h_z)
        pooled = jnp.mean(h_f, axis=(1, 2))
        g = pooled @ qeffnet._deq_se(blk_["se_reduce"]) + blk_["se_reduce"]["b"]
        g = g * jax.nn.sigmoid(g)
        g = jax.nn.sigmoid(g @ qeffnet._deq_se(blk_["se_expand"]) + blk_["se_expand"]["b"])
        h = qeffnet._requant(h_f * g[:, None, None, :], blk_["se_scale"], blk_["se_zp"])
        h = qeffnet._conv_q(h, blk_["se_zp"], blk_["se_scale"], blk_["project"], 1, 0,
                            act=False, requant=False)
        if spec.has_residual(ss, bb):
            h = h + dequantize_affine_shifted(cur, cur_s, cur_z)
        cur = qeffnet._requant(h, blk_["out_scale"], blk_["out_zp"])
        cur_s, cur_z = blk_["out_scale"], blk_["out_zp"]

    x_in = cur  # int8 input to stage1 block1, in (in_s, in_z) domain
    # unfused reference for the target block
    h, h_s, h_z = x_in, in_s, in_z
    h = qeffnet._conv_q(h, h_z, h_s, blk["expand"], 1, 0, act=True, requant=True)
    h_s, h_z = blk["expand"]["out_scale"], blk["expand"]["out_zp"]
    k = spec.stage_kernels[s]
    h = qeffnet._conv_q(
        h, h_z, h_s, blk["dw"], 1, (k - 1) // 2,
        groups=int(blk["dw"]["w_q"].shape[3]), act=True, requant=True,
    )
    h_s, h_z = blk["dw"]["out_scale"], blk["dw"]["out_zp"]
    h_f = dequantize_affine_shifted(h, h_s, h_z)
    pooled = jnp.mean(h_f, axis=(1, 2))
    g = pooled @ qeffnet._deq_se(blk["se_reduce"]) + blk["se_reduce"]["b"]
    g = g * jax.nn.sigmoid(g)
    g = jax.nn.sigmoid(g @ qeffnet._deq_se(blk["se_expand"]) + blk["se_expand"]["b"])
    h = qeffnet._requant(h_f * g[:, None, None, :], blk["se_scale"], blk["se_zp"])
    h = qeffnet._conv_q(h, blk["se_zp"], blk["se_scale"], blk["project"], 1, 0,
                        act=False, requant=False)
    h = h + dequantize_affine_shifted(x_in, in_s, in_z)
    ref = np.asarray(qeffnet._requant(h, blk["out_scale"], blk["out_zp"]), np.int32)

    qf = fusedpath.pack_fused(spec, qmodel)
    got = np.asarray(
        fused_mbconv_block(
            x_in, qf[f"s{s}b{b}"], kernel=k, stride=1, act="silu",
            x_res=x_in, interpret=True,
        ),
        np.int32,
    )
    assert got.shape == ref.shape
    diff = np.abs(got - ref)
    assert diff.max() <= 1, (diff.max(), (diff > 1).mean())
    assert (diff > 0).mean() < 0.02  # flips are rare, not systematic


def test_pick_nb_divides_and_respects_budget():
    from inference_efficient_vision_models_tpu.ops.fused_mbconv import pick_nb

    assert pick_nb(8, 16, 16, 64) == 8          # tiny block → whole batch
    nb = pick_nb(256, 114, 114, 96)
    assert 256 % nb == 0 and nb >= 1
    assert 6 * 114 * 114 * 96 * 4 * nb <= (8 << 20) or nb == 1
