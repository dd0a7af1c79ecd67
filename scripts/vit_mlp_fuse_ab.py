#!/usr/bin/env python
"""A/B the int8-intermediate MLP fusion in the ViT static-int8 bf16 executor.

Same converted static-int8 ViT-S/16 model, two dispatch modes of the mlp1→mlp2
pair (qvit.apply_int8's bf16 path):

  unfused (IEVM_VIT_MLP_FUSE=0) — mlp1's Pallas kernel dequantizes its GELU
    output to bf16 in HBM; mlp2's kernel re-quantizes it in VMEM,
  fused   (default)             — mlp1 requantizes straight to mlp2's input
    qparams, so the (B·T, 4D) hidden lives in HBM as int8.

Latency does not depend on the weight VALUES, so the model is random-init
(the numerics equivalence is covered by tests/test_ops.py
test_int8_mlp_pair_fused_matches_unfused). Device-chained batch-256 timing,
median-of-5 with a scalar fetch per round (verify-skill protocol). Feeds the
REPORT.md ViT serving table (r3 left static_int8_bf16 at 58.9 ms vs 40.1 ms
bf16; the ~18 ms gap was identified as per-dense quantize/requant HBM
traffic by scripts/vit_block_pieces.py).

Usage: python scripts/vit_mlp_fuse_ab.py [batch]
"""
import json
import logging
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from inference_efficient_vision_models_tpu.compress.quant import qvit
from inference_efficient_vision_models_tpu.data.pipeline import Batches
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.utils import (
    cpu_device,
    device_materialize,
    enable_compilation_cache,
)


def _chained_ms(fn, x, k=16):
    def chain(kk):
        def body(i, xx):
            out = fn(xx)
            return xx + (jnp.sum(out.astype(jnp.float32)) > 0).astype(xx.dtype)

        return jax.jit(lambda v: lax.fori_loop(0, kk, body, v))

    def t(kk):
        f = chain(kk)
        r = f(x)
        jax.block_until_ready(r)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = f(x)
            float(jnp.ravel(r)[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max(t(2 * k) - t(k), 1e-9) / k * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    enable_compilation_cache()
    logging.disable(logging.INFO)

    with jax.default_device(cpu_device()):
        spec, params, state = create_model("vit_small_patch16_224", num_classes=6)
    folded = qvit.fold(spec, params, state)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 255, (32, 224, 224, 3)).astype(np.uint8)
    observers = qvit.calibrate(
        spec, folded, Batches(calib, np.zeros(32, np.int32), 32), max_images=32
    )
    qmodel = device_materialize(
        qvit.convert_static_int8(spec, folded, observers, image_size=(224, 224))
    )
    x = device_materialize(
        jnp.asarray(rng.integers(0, 255, (batch, 224, 224, 3)).astype(np.uint8))
    )

    out = {"batch": batch}
    for mode, env in (("unfused", "0"), ("fused", "1")):
        os.environ["IEVM_VIT_MLP_FUSE"] = env
        ms = _chained_ms(lambda v: qvit.apply_int8_bf16(spec, qmodel, v), x)
        out[f"{mode}_ms_per_batch"] = round(ms, 2)
        print(f"{mode}: {ms:.2f} ms/b{batch}", flush=True)
    out["speedup"] = round(out["unfused_ms_per_batch"] / out["fused_ms_per_batch"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
