#!/usr/bin/env python
"""Decompose the ViT-S static-int8 model-level slowdown (81.5 vs 40.5 ms).

scripts/vit_int8_micro.py showed the int8 dense layers are FASTER than bf16
in isolation (1.58 vs 2.18 ms per block of dense time), so the 2x model
slowdown lives elsewhere. This script times the real pruned ViT-S artifact
(same construction as scripts/family_bench.py) in progressively swapped
configurations to localize the cost:

  folded_bf16     full bf16 baseline               (expects ~40 ms)
  int8_fp32       shipped static_int8              (expects ~81 ms)
  int8_bf16       shipped static_int8_bf16         (expects ~81 ms)
  stem_u8         u8 patch-embed stem alone
  stem_f32        fp32 patch-embed conv alone
  blocks_int8     12 int8 blocks on a fixed token tensor (no stem)
  blocks_bf16     12 bf16 folded blocks on the same tensor

Usage: python scripts/vit_int8_decompose.py
"""
import sys, time, logging
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.compress.prune import prune_model
from inference_efficient_vision_models_tpu.compress.quant.engine import QuantizationEngine
from inference_efficient_vision_models_tpu.compress.quant import qvit, stemfold
from inference_efficient_vision_models_tpu.data.synthetic import make_synthetic_neudet
from inference_efficient_vision_models_tpu.core.config import QuantConfig
from inference_efficient_vision_models_tpu.utils import device_materialize, enable_compilation_cache

enable_compilation_cache()
logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("vitdec")


def chain(body, k):
    def b(i, x):
        out = body(x)
        return x + (jnp.sum(out.astype(jnp.float32)) > 0).astype(x.dtype)
    return jax.jit(lambda x: lax.fori_loop(0, k, b, x))


def _timeit_once(fn, x, iters=5):
    r = fn(x); float(jnp.ravel(r)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(x)
        float(jnp.ravel(r)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def timeit(body, x, k=8, iters=5):
    t_k = _timeit_once(chain(body, k), x, iters)
    t_2k = _timeit_once(chain(body, 2 * k), x, iters)
    return max(t_2k - t_k, 1e-9) / k * 1e3


B = 256
x_np = np.random.default_rng(0).integers(0, 255, (B, 224, 224, 3)).astype(np.uint8)
with jax.default_device(jax.devices("cpu")[0]):
    spec, params, state = create_model("vit_small_patch16_224", num_classes=6)
    pspec, pp, ps = prune_model(spec, params, state, ratio=0.1, method="l2", round_to=8)
cfg = QuantConfig(batch_size=64, calibration_images=64)
eng = QuantizationEngine(cfg, pspec, pp, ps, logging.getLogger("v"))
qmodel, _ = eng.static_quantize(make_synthetic_neudet(32, 224, seed=0))
qmodel = device_materialize(qmodel)
fold16 = device_materialize(jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, eng.folded))
xu8 = device_materialize(jnp.asarray(x_np))
xf = device_materialize(jnp.asarray(x_np).astype(jnp.float32))

log.info("full models:")
t = timeit(lambda xx: qvit.apply_folded(pspec, fold16, xx.astype(jnp.bfloat16) / 255.0), xf)
log.info(f"  folded_bf16  {t:7.2f} ms")
t = timeit(lambda xx: qvit.apply_int8(pspec, qmodel, xx), xu8)
log.info(f"  int8_fp32    {t:7.2f} ms")
t = timeit(lambda xx: qvit.apply_int8_bf16(pspec, qmodel, xx), xu8)
log.info(f"  int8_bf16    {t:7.2f} ms")

log.info("stems:")
pe = qmodel["patch_embed"]
t = timeit(lambda xx: stemfold.apply_u8_stem(pe, xx, stride=int(pspec.patch), pad=0, act="none"), xu8)
log.info(f"  stem_u8      {t:7.2f} ms")
pef = fold16["patch_embed"]
t = timeit(
    lambda xx: lax.conv_general_dilated(
        (xx.astype(jnp.bfloat16) / 255.0), jnp.asarray(pef["w"]),
        (pspec.patch, pspec.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")), xf)
log.info(f"  stem_bf16    {t:7.2f} ms")

# blocks only: run the 12-block trunk on a fixed token tensor
T = (224 // int(pspec.patch)) ** 2 + 1
hd = pspec.head_dim
tok = np.random.default_rng(1).normal(size=(B, T, pspec.dim)).astype(np.float32)


def blocks_int8(h, act_dtype):
    # mirrors apply_int8's placement: Pallas for the adjacent mlp pair only
    b = h.shape[0]
    h = h.astype(act_dtype)
    mlp = qvit._static_dense if act_dtype == jnp.float32 else qvit._static_dense_fast
    for i in range(pspec.depth):
        blk = qmodel["blocks"][str(i)]
        heads = blk["qkv"]["w_q"].shape[1] // (3 * hd)
        z = qvit._layer_norm(h, blk["ln1"])
        qkv = qvit._static_dense(z, blk["qkv"]).reshape(b, -1, 3, heads, hd)
        qh, kh, vh = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
        out = qvit._int8_attention(qh, kh, vh, hd, act_dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, heads * hd)
        h = h + qvit._static_dense(out, blk["proj"])
        z = qvit._layer_norm(h, blk["ln2"])
        z = mlp(z, blk["mlp1"], act="gelu")
        h = h + mlp(z, blk["mlp2"])
    return h


def _bf16_dense(x, d):
    return (x @ jnp.asarray(d["w"]) + jnp.asarray(d["b"])).astype(x.dtype)


def blocks_bf16(h):
    b = h.shape[0]
    h = h.astype(jnp.bfloat16)
    for i in range(pspec.depth):
        blk = fold16["blocks"][str(i)]
        heads = blk["qkv"]["w"].shape[1] // (3 * hd)
        z = qvit._layer_norm(h, blk["ln1"])
        qkv = _bf16_dense(z, blk["qkv"]).reshape(b, -1, 3, heads, hd)
        qh, kh, vh = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
        out = qvit._int8_attention(qh, kh, vh, hd, jnp.bfloat16)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, heads * hd)
        h = h + _bf16_dense(out, blk["proj"])
        z = qvit._layer_norm(h, blk["ln2"])
        z = jax.nn.gelu(_bf16_dense(z, blk["mlp1"]), approximate=False)
        h = h + _bf16_dense(z, blk["mlp2"])
    return h


tokd = device_materialize(jnp.asarray(tok))
log.info("12-block trunks (fixed token input, no stem/head):")
t = timeit(lambda xx: blocks_int8(xx, jnp.float32), tokd)
log.info(f"  blocks_int8_fp32 {t:7.2f} ms")
t = timeit(lambda xx: blocks_int8(xx, jnp.bfloat16), tokd)
log.info(f"  blocks_int8_bf16 {t:7.2f} ms")
t = timeit(lambda xx: blocks_bf16(xx), tokd)
log.info(f"  blocks_bf16      {t:7.2f} ms")
