#!/usr/bin/env python
"""Host s2d preprocess microbench: numpy transpose vs native C++ interleave.

The Predictor's host preprocess budget for the 256-image serving batch —
run on an idle host (REPORT serving-runtime section).
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
from inference_efficient_vision_models_tpu.data.native_loader import s2d_batch_native

B = 256
x = np.random.default_rng(0).integers(0, 255, (B, 224, 224, 3)).astype(np.uint8)
ref = np.ascontiguousarray(
    x.reshape(B, 112, 2, 112, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, 112, 112, 12)
)

def med(fn, n=9):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3

numpy_ms = med(lambda: np.ascontiguousarray(
    x.reshape(B, 112, 2, 112, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, 112, 112, 12)))
got = s2d_batch_native(x)
assert got is not None and np.array_equal(got, ref)
native_ms = med(lambda: s2d_batch_native(x))
print(f"host s2d, batch {B}x224x224x3 ({x.nbytes/1e6:.1f} MB):")
print(f"  numpy transpose : {numpy_ms:7.2f} ms  ({B/numpy_ms*1e3:8,.0f} img/s ceiling)")
print(f"  native C++      : {native_ms:7.2f} ms  ({B/native_ms*1e3:8,.0f} img/s ceiling)  {numpy_ms/native_ms:.2f}x")
