#!/usr/bin/env python
"""A/B the ViT static-int8 executors on the real vt1 artifacts (one chip).

Same int8 artifact, two executors: fp32 activation carrier (`apply_int8`,
the reference-protocol default) vs bf16 carrier (`apply_int8_bf16` — bf16
attention einsums + elementwise, fp32 softmax/affine algebra, int32
accumulation). Reports per-fold accuracy on the vt1 test split and
device-chained batch-256 latency for both, feeding REPORT.md's ViT serving
guidance.

Usage: python scripts/vit_bf16_ab.py   (after the vt1 artifacts exist)
"""
import logging
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from inference_efficient_vision_models_tpu.core.config import QuantConfig
from inference_efficient_vision_models_tpu.data import load_dataset
from inference_efficient_vision_models_tpu.serving import load_quantized
from inference_efficient_vision_models_tpu.utils import (
    device_materialize,
    enable_compilation_cache,
)

enable_compilation_cache()
logging.basicConfig(level=logging.INFO)
log = logging.getLogger("vit_ab")

cfg = QuantConfig(experiment_name="vt1", choice=2, synthetic_size=600,
                  num_folds=5)  # must match regen_pipelines.sh's vt1 protocol
test_imgs, test_labels = load_dataset(cfg, log)["test"]
EVAL_BS = 32


def accuracy(fn, n_max=600):
    n = min(len(test_imgs), n_max)
    preds = []
    for i in range(0, n, EVAL_BS):
        chunk = test_imgs[i : i + EVAL_BS]
        m = len(chunk)
        if m < EVAL_BS:  # static shapes: pad the tail chunk
            chunk = np.concatenate(
                [chunk, np.zeros((EVAL_BS - m, *chunk.shape[1:]), chunk.dtype)]
            )
        preds.append(np.asarray(fn(jnp.asarray(chunk)))[:m].argmax(1))
    return float((np.concatenate(preds) == test_labels[:n]).mean())


def _chain(fn, k):
    def body(i, xx):
        out = fn(xx)
        return xx + (jnp.sum(out.astype(jnp.float32)) > 0).astype(xx.dtype)

    return jax.jit(lambda xx: lax.fori_loop(0, k, body, xx))


def _timeit_once(cf, x, iters=5):
    # one-SCALAR fetch via a device-side slice (np.asarray(r) would pull the
    # whole carrier over the axon tunnel); median, never min
    r = cf(x)
    float(jnp.ravel(r)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = cf(x)
        float(jnp.ravel(r)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def chained_ms(fn, x, k=8, iters=5):
    # K vs 2K chained difference cancels every constant per-call cost
    # (dispatch, tunnel round trip, scalar fetch) — bench.py:_chained_ms
    t_k = _timeit_once(_chain(fn, k), x, iters)
    t_2k = _timeit_once(_chain(fn, 2 * k), x, iters)
    return max(t_2k - t_k, 1e-9) / k * 1e3

accs = {"fp32_carrier": [], "bf16_carrier": []}
for fold in range(5):
    fold_dir = f"output/quantization/vt1/fold_{fold}"
    try:
        _, _, fn_f32, _ = load_quantized(fold_dir, "static_int8")
        _, _, fn_b16, _ = load_quantized(fold_dir, "static_int8_bf16")
    except FileNotFoundError:
        log.warning("fold %d artifact missing — skipping", fold)
        continue
    a32, a16 = accuracy(fn_f32), accuracy(fn_b16)
    accs["fp32_carrier"].append(a32)
    accs["bf16_carrier"].append(a16)
    log.info("fold %d  fp32-carrier %.2f%%  bf16-carrier %.2f%%",
             fold, a32 * 100, a16 * 100)

for k, v in accs.items():
    if v:
        log.info("MEAN %s: %.2f%% over %d folds", k, float(np.mean(v)) * 100, len(v))

# device-chained speed on fold_0, batch 256 (dispatch amortized)
B = 256
spec, model, _, _ = load_quantized("output/quantization/vt1/fold_0", "static_int8")
model = device_materialize(model)
x = device_materialize(
    jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 224, 224, 3)).astype(np.uint8)
    )
)
from inference_efficient_vision_models_tpu.compress.quant import qvit

ms32 = chained_ms(lambda xx: qvit.apply_int8(spec, model, xx), x)
ms16 = chained_ms(lambda xx: qvit.apply_int8_bf16(spec, model, xx), x)
log.info("batch-%d chained: fp32-carrier %.2f ms (%.0f img/s)  "
         "bf16-carrier %.2f ms (%.0f img/s)  speedup %.2fx",
         B, ms32, B / ms32 * 1e3, ms16, B / ms16 * 1e3, ms32 / ms16)
