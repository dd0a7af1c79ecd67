#!/usr/bin/env python
"""Tune the fused-quant Pallas int8 dense across ViT-S shapes on one chip.

For each ViT-S dense shape (M = 256x197 tokens), compares:
  - bf16 XLA dense                      (the speed target)
  - XLA static_dense composition        (quantize + int8 dot + dequant)
  - Pallas fused (bf16 in, bf16 out)    over a block_m x block_n grid

Usage: python scripts/vit_pallas_tune.py
"""
import sys, time, logging
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from inference_efficient_vision_models_tpu.ops.int8_matmul import int8_matmul_requant
from inference_efficient_vision_models_tpu.compress.quant.observers import quantize_affine_shifted
from inference_efficient_vision_models_tpu.utils import device_materialize, enable_compilation_cache

enable_compilation_cache()
logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("tune")


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


B, T = 256, 197
M = B * T
rng = np.random.default_rng(0)
SHAPES = [("qkv", 384, 1152), ("proj", 384, 384), ("mlp1", 384, 1536), ("mlp2", 1536, 384)]
s, zp = 0.0371, 131

for name, K, N in SHAPES:
    x16 = device_materialize(jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16))
    w16 = device_materialize(jnp.asarray(rng.normal(size=(K, N)).astype(np.float32), jnp.bfloat16))
    w8 = device_materialize(jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8))
    ws = device_materialize(jnp.asarray(rng.uniform(0.001, 0.02, (N,)), jnp.float32))
    b = device_materialize(jnp.asarray(rng.normal(size=(N,)), jnp.float32))
    wsum = device_materialize(jnp.sum(w8.astype(jnp.int32), axis=0))

    t_bf16 = timeit(lambda x: (x @ w16 + b.astype(jnp.bfloat16)).astype(jnp.bfloat16), x16)

    def static_dense(x):
        x_s = quantize_affine_shifted(x, s, zp)
        acc = lax.dot_general(x_s, w8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        acc = acc - (zp - 128) * wsum
        y = acc.astype(jnp.float32) * (s * ws) + b
        return y.astype(jnp.bfloat16)

    t_xla = timeit(static_dense, x16)
    log.info(f"{name:5s} K={K:4d} N={N:4d}  bf16 {t_bf16:6.3f}  xla_int8 {t_xla:6.3f} ms")

    best = (1e9, None)
    for bm in (256, 512, 1024, 2048):
        for bn in (128, 256, 384 if N % 384 == 0 else 512, N):
            if bn > N:
                continue
            try:
                t = timeit(
                    lambda x, bm=bm, bn=bn: int8_matmul_requant(
                        x, w8, ws, b, wsum, in_scale=s, in_zp=zp,
                        out_dtype=jnp.bfloat16, block_m=bm, block_n=bn), x16)
            except Exception as e:  # noqa: BLE001
                log.info(f"    bm={bm:4d} bn={bn:4d}  FAIL {type(e).__name__}")
                continue
            mark = " <" if t < best[0] else ""
            log.info(f"    bm={bm:4d} bn={bn:4d}  {t:6.3f} ms{mark}")
            if t < best[0]:
                best = (t, (bm, bn))
    log.info(f"  best pallas {best[0]:6.3f} ms @ {best[1]}   "
             f"(bf16 {t_bf16:6.3f} / xla_int8 {t_xla:6.3f})")
