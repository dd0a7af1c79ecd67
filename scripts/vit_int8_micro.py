#!/usr/bin/env python
"""Decompose the ViT static-int8 slowdown on one TPU chip.

The family sweep (REPORT.md "Family x method serving") measured ViT-S/16
static int8 at 81.5 ms/b256 vs 40.5 ms bf16 — int8 HALVES throughput — and
the bf16-carrier executor recovered only 1.01x, so the carrier dtype is not
the cost. This script times each candidate culprit in isolation at the
exact ViT-S dense shapes (M = 256 batch x 197 tokens), chained K-vs-2K
protocol (same as family_bench.py):

  1. bf16 dense               x_bf16 . w_bf16                      (baseline)
  2. int8 dot only            x_s8 . w_s8 -> int32                 (MXU path?)
  3. full _static_dense       quantize + dot + affine dequant       (shipped)
  4. quantize pass alone      bf16 -> shifted int8
  5. Pallas fused kernel      ops/int8_matmul.int8_matmul_requant

Usage: python scripts/vit_int8_micro.py
"""
import sys, time, logging
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from inference_efficient_vision_models_tpu.ops.int8_matmul import int8_matmul_requant
from inference_efficient_vision_models_tpu.compress.quant.observers import (
    quantize_affine_shifted,
)
from inference_efficient_vision_models_tpu.utils import (
    device_materialize,
    enable_compilation_cache,
)

enable_compilation_cache()
logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("vitmicro")


def chain(body, k):
    def b(i, x):
        out = body(x)
        return x + (jnp.sum(out.astype(jnp.float32)) > 0).astype(x.dtype)

    return jax.jit(lambda x: lax.fori_loop(0, k, b, x))


def _timeit_once(fn, x, iters=5):
    r = fn(x)
    float(jnp.ravel(r)[0])
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

# ViT-S block dense shapes: qkv 384->1152, proj 384->384, mlp1 384->1536,
# mlp2 1536->384. Per 12-layer model each shape appears 12x.
SHAPES = [("qkv", 384, 1152), ("proj", 384, 384), ("mlp1", 384, 1536), ("mlp2", 1536, 384)]

for name, K, N in SHAPES:
    x16 = device_materialize(jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), dtype=jnp.bfloat16))
    xs8 = device_materialize(jnp.asarray(rng.integers(-127, 127, (M, K)), dtype=jnp.int8))
    w16 = device_materialize(jnp.asarray(rng.normal(size=(K, N)).astype(np.float32), dtype=jnp.bfloat16))
    w8 = device_materialize(jnp.asarray(rng.integers(-127, 127, (K, N)), dtype=jnp.int8))
    wscale = device_materialize(jnp.full((N,), 0.01, jnp.float32))
    bias = device_materialize(jnp.zeros((N,), jnp.float32))
    wsum = device_materialize(jnp.sum(w8.astype(jnp.int32), axis=0))

    t_bf16 = timeit(
        lambda x: lax.dot_general(x, w16, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32), x16)
    t_dot8 = timeit(
        lambda x: lax.dot_general(x, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32), xs8)

    def static_dense(x):
        x_s = quantize_affine_shifted(x, 0.05, 128)
        acc = lax.dot_general(x_s, w8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        acc = acc - (128 - 128) * wsum
        y = acc.astype(jnp.float32) * (0.05 * wscale) + bias
        return y.astype(jnp.bfloat16)

    t_full = timeit(static_dense, x16)
    t_q = timeit(lambda x: quantize_affine_shifted(x, 0.05, 128), x16)
    t_pallas = timeit(
        lambda x: int8_matmul_requant(
            x, w8, wscale, bias, wsum, in_scale=0.05, in_zp=128), xs8)

    log.info(
        f"{name:5s} K={K:4d} N={N:4d}  bf16 {t_bf16:6.3f}  int8dot {t_dot8:6.3f}  "
        f"quant {t_q:6.3f}  static_dense {t_full:6.3f}  pallas {t_pallas:6.3f}  ms"
    )

log.info("NOTE: per 12-layer ViT-S each shape runs 12x per forward; "
         "b256 model totals = 12 * sum(shape times) + attention + LN/softmax/GELU.")
