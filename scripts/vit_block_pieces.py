#!/usr/bin/env python
"""Per-op timing of one ViT-S block at b256, int8 vs bf16 paths.

Block trunk totals (scripts/vit_int8_decompose.py): int8 bf16-carrier
61.9 ms/12 blocks, folded-style bf16 40.5 ms — yet isolated dense micros
(scripts/vit_int8_micro.py) say int8 dense is FASTER. This times every op
of block 0 with the real artifact params to find where the 1.8 ms/block
goes.

Usage: python scripts/vit_block_pieces.py
"""
import sys, time, logging
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.compress.prune import prune_model
from inference_efficient_vision_models_tpu.compress.quant.engine import QuantizationEngine
from inference_efficient_vision_models_tpu.compress.quant import qvit
from inference_efficient_vision_models_tpu.models.vit import _layer_norm
from inference_efficient_vision_models_tpu.data.synthetic import make_synthetic_neudet
from inference_efficient_vision_models_tpu.core.config import QuantConfig
from inference_efficient_vision_models_tpu.utils import device_materialize, enable_compilation_cache

enable_compilation_cache()
logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("vitpieces")


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


def timeit(body, x, k=16, iters=5):
    t_k = _timeit_once(chain(body, k), x, iters)
    t_2k = _timeit_once(chain(body, 2 * k), x, iters)
    return max(t_2k - t_k, 1e-9) / k * 1e3


B = 256
with jax.default_device(jax.devices("cpu")[0]):
    spec, params, state = create_model("vit_small_patch16_224", num_classes=6)
    pspec, pp, ps = prune_model(spec, params, state, ratio=0.1, method="l2", round_to=8)
cfg = QuantConfig(batch_size=64, calibration_images=64)
eng = QuantizationEngine(cfg, pspec, pp, ps, logging.getLogger("v"))
qmodel, _ = eng.static_quantize(make_synthetic_neudet(32, 224, seed=0))
qmodel = device_materialize(qmodel)
fold16 = device_materialize(jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, eng.folded))

T = (224 // int(pspec.patch)) ** 2 + 1
hd = pspec.head_dim
blk = qmodel["blocks"]["0"]
fblk = fold16["blocks"]["0"]
heads = blk["qkv"]["w_q"].shape[1] // (3 * hd)
dim = pspec.dim
rng = np.random.default_rng(0)

h = device_materialize(jnp.asarray(rng.normal(size=(B, T, dim)), jnp.bfloat16))
z1152 = device_materialize(jnp.asarray(rng.normal(size=(B, T, blk["qkv"]["w_q"].shape[1])), jnp.bfloat16))
zmlp = device_materialize(jnp.asarray(rng.normal(size=(B, T, fblk["mlp1"]["w"].shape[1])), jnp.bfloat16))


def bf16_dense(x, d):
    return (x @ jnp.asarray(d["w"]) + jnp.asarray(d["b"])).astype(x.dtype)


rows = [
    ("ln1", lambda x: _layer_norm(x, blk["ln1"]), h),
    ("qkv_int8", lambda x: qvit._static_dense(x, blk["qkv"]), h),
    ("qkv_bf16", lambda x: bf16_dense(x, fblk["qkv"]), h),
    ("split_attn_merge", lambda x: qvit._int8_attention(
        *(x.reshape(B, T, 3, heads, hd)[:, :, j].transpose(0, 2, 1, 3) for j in range(3)),
        hd, jnp.bfloat16).transpose(0, 2, 1, 3).reshape(B, T, heads * hd), z1152),
    ("proj_int8", lambda x: qvit._static_dense(x[..., :heads * hd], blk["proj"]), h),
    ("proj_bf16", lambda x: bf16_dense(x[..., :heads * hd], fblk["proj"]), h),
    ("mlp1_int8+gelu", lambda x: jax.nn.gelu(qvit._static_dense(x, blk["mlp1"]), approximate=False), h),
    ("mlp1_bf16+gelu", lambda x: jax.nn.gelu(bf16_dense(x, fblk["mlp1"]), approximate=False), h),
    ("mlp2_int8", lambda x: qvit._static_dense(x, blk["mlp2"]), zmlp),
    ("mlp2_bf16", lambda x: bf16_dense(x, fblk["mlp2"]), zmlp),
]
for name, fn, x in rows:
    log.info(f"  {name:18s} {timeit(fn, x):7.3f} ms")
