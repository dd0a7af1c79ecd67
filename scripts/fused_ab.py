#!/usr/bin/env python
"""Fused whole-block MBConv kernel A/B on the real chip.

VERDICT r2 §6 asked for ONE genuinely new MBConv int8 schedule: a Pallas
kernel holding expand + depthwise + SE + project VMEM-resident so the
6x-expanded hidden tensor never round-trips HBM (`ops/fused_mbconv.py`,
packed by `compress/quant/fusedpath.py`). This script measures it:
whole-model static-int8 forward at batch 256, fused vs the unfused lax op
chain, with the bf16 folded path as context — same chained-median timing
protocol as scripts/family_bench.py. The result (either way) goes in
REPORT.md's int8 roofline section.

Usage: python scripts/fused_ab.py
"""
import sys, time, logging
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.compress.prune import prune_model
from inference_efficient_vision_models_tpu.compress.quant.engine import QuantizationEngine
from inference_efficient_vision_models_tpu.compress.quant import fusedpath
from inference_efficient_vision_models_tpu.data.synthetic import make_synthetic_neudet
from inference_efficient_vision_models_tpu.utils import device_materialize, enable_compilation_cache
from inference_efficient_vision_models_tpu.core.config import QuantConfig
enable_compilation_cache()


def chain(body, k):
    def b(i, x):
        out = body(x)
        return x + (jnp.sum(out.astype(jnp.float32)) > 0).astype(x.dtype)
    return jax.jit(lambda x: lax.fori_loop(0, k, b, x))


def _timeit_once(fn, x, iters=5):
    # one-SCALAR fetch via a device-side slice: np.asarray(r) would pull the
    # whole carrier over the axon tunnel and dominate the measurement
    r = fn(x); float(jnp.ravel(r)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(x)
        float(jnp.ravel(r)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def timeit(body, x, k=16, iters=5):
    # K vs 2K chained difference cancels every constant per-call cost
    # (dispatch, tunnel round trip, scalar fetch) — bench.py:_chained_ms
    t_k = _timeit_once(chain(body, k), x, iters)
    t_2k = _timeit_once(chain(body, 2 * k), x, iters)
    return max(t_2k - t_k, 1e-9) / k * 1e3


B = 256
x_np = np.random.default_rng(0).integers(0, 255, (B, 224, 224, 3)).astype(np.uint8)
for name in ("efficientnet_b0", "mobilenet_v2"):
  try:  # per-family isolation: one family's failure keeps the other's numbers
    with jax.default_device(jax.devices("cpu")[0]):
        spec, params, state = create_model(name, num_classes=6)
        pspec, pp, ps = prune_model(spec, params, state, ratio=0.1, method="l2", round_to=8)
    cfg = QuantConfig(batch_size=64, calibration_images=64)
    eng = QuantizationEngine(cfg, pspec, pp, ps, logging.getLogger("v"))
    qmod = eng.q
    qmodel, _ = eng.static_quantize(make_synthetic_neudet(32, 224, seed=0))
    qf = fusedpath.pack_fused(pspec, qmodel)
    qmodel = device_materialize(qmodel)
    qf = device_materialize(qf)
    fold16 = device_materialize(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, eng.folded))
    x_u8 = device_materialize(jnp.asarray(x_np))
    xf = device_materialize(jnp.asarray(x_np).astype(jnp.float32))

    # correctness gate before timing: fused must agree with unfused up to
    # the contracted tolerance — ±1 requant quantum per block output
    # (tests/test_fused_mbconv.py): the kernel's reciprocal-multiply requant
    # vs the op chain's division can flip a rounding at half-quantum
    # boundaries, so exact logits aren't promised, matching argmax is.
    lo_a = np.asarray(jax.jit(lambda xx: qmod.apply_int8(pspec, qmodel, xx))(x_u8[:8]))
    lo_b = np.asarray(jax.jit(
        lambda xx: fusedpath.apply_int8_fused(pspec, qmodel, qf, xx))(x_u8[:8]))
    err = float(np.max(np.abs(lo_a - lo_b)))
    assert (lo_a.argmax(1) == lo_b.argmax(1)).all(), f"{name}: fused argmax diverges"
    assert err < 0.1, f"{name}: fused/unfused logits diverge ({err})"

    rows = {}
    rows["int8 unfused"] = timeit(lambda xx: qmod.apply_int8(pspec, qmodel, xx), x_u8)
    rows["int8 fused"] = timeit(
        lambda xx: fusedpath.apply_int8_fused(pspec, qmodel, qf, xx), x_u8)
    rows["bf16 folded"] = timeit(
        lambda xx: qmod.apply_folded(pspec, fold16, xx.astype(jnp.bfloat16) / 255.0), xf)
    for m, ms in rows.items():
        print(f"{name:16s} {m:13s} {ms:8.2f} ms/b{B}  {B/ms*1e3:10,.0f} img/s")
    print(f"{name:16s} fused speedup vs unfused: "
          f"{rows['int8 unfused']/rows['int8 fused']:.2f}x; "
          f"vs bf16: {rows['bf16 folded']/rows['int8 fused']:.2f}x  (max|dlogit| {err:.2e})")
  except Exception as e:
    import traceback
    traceback.print_exc()
    print(f"{name}: FAILED ({e})")
