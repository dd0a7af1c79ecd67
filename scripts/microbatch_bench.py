#!/usr/bin/env python
"""Online-serving benchmark: MicroBatcher coalescing vs per-request dispatch.

Closed-loop load: C client threads each send R sequential 1-image uint8
requests to the r2 static-int8 artifact (shape buckets 1/8/64). Two modes
over the SAME code path (MicroBatcher → bucket routing → scatter):

  direct  max_batch=1   — every request is its own device call (the
                          no-coalescing baseline; still bucket-1 routed)
  micro   max_batch=64  — the dispatcher coalesces whatever is waiting

Per-request latency is submit→result at the client; throughput is
requests/wall. Over the axon tunnel each device call pays the ~33 ms
transport floor (REPORT.md "Serving benchmark"), so coalescing shows up
as a throughput multiple at C>1 — exactly the production story. Run with
nothing else on the box (verify skill: one host CPU).

Usage: python scripts/microbatch_bench.py [fold_dir]
"""
import sys, time
sys.path.insert(0, ".")
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from inference_efficient_vision_models_tpu.serving import MicroBatcher, Predictor
from inference_efficient_vision_models_tpu.utils import enable_compilation_cache

enable_compilation_cache()

FOLD = sys.argv[1] if len(sys.argv) > 1 else "output/quantization/r2/fold_0"
R = 8  # requests per client

pred = Predictor.from_artifact(FOLD, "static_int8", batch_size=64,
                               bucket_sizes=(1, 8, 64))
t0 = time.perf_counter()
pred.warmup()
print(f"warmup (3 bucket programs): {time.perf_counter() - t0:.1f} s")

rng = np.random.default_rng(0)
img = rng.integers(0, 255, (1, 224, 224, 3)).astype(np.uint8)


def run(mode: str, clients: int):
    max_batch = 1 if mode == "direct" else 64
    lat = []

    def client(_):
        out = []
        for _ in range(R):
            t = time.perf_counter()
            mb.infer(img)
            out.append(time.perf_counter() - t)
        return out

    with MicroBatcher(pred, max_wait_ms=2.0, max_batch=max_batch) as mb:
        mb.infer(img)  # steady-state: dispatcher warm before the clock
        t0 = time.perf_counter()
        with ThreadPoolExecutor(clients) as pool:
            for res in pool.map(client, range(clients)):
                lat.extend(res)
        wall = time.perf_counter() - t0
        st = mb.stats()
    lat = np.array(lat) * 1e3
    n = clients * R
    print(f"{mode:6s} C={clients:3d}  {n / wall:7.1f} req/s  "
          f"p50 {np.percentile(lat, 50):7.1f} ms  p99 {np.percentile(lat, 99):7.1f} ms  "
          f"imgs/call {(st['images'] - 1) / max(st['batches'] - 1, 1):5.1f}")


for clients in (1, 8, 32):
    for mode in ("direct", "micro"):
        run(mode, clients)
