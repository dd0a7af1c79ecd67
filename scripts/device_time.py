#!/usr/bin/env python
"""TRUE device-time measurements via fori_loop-chained programs.

Per-call wall timings over the axon tunnel include ~ms-scale dispatch; any
kernel faster than that is unmeasurable call-by-call. Chaining K iterations
inside ONE jitted program (each iteration data-dependent on the previous)
amortizes dispatch to nothing: device_time ≈ total / K.

Measures: dispatch floor, MXU peaks (int8/bf16 matmul, int8/bf16 conv),
and the static-int8 pruned-ResNet18 forward at batch 256 and batch 1.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(fn, *args, iters=5):
    r = fn(*args)
    import jax

    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from inference_efficient_vision_models_tpu.utils import (
        cpu_device,
        device_materialize,
        enable_compilation_cache,
    )

    enable_compilation_cache()
    K = int(dict(a.split("=", 1) for a in sys.argv[1:]).get("k", 32))

    # ---- dispatch floor ----------------------------------------------------
    one = device_materialize(jnp.ones((8, 128), jnp.float32))
    tiny = jax.jit(lambda x: x + 1.0)
    r = tiny(one); jax.block_until_ready(r)
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        jax.block_until_ready(tiny(one))
        lats.append((time.perf_counter() - t0) * 1e3)
    print(f"sync dispatch floor (tiny op): p50 {np.percentile(lats, 50):.3f} ms "
          f"min {min(lats):.3f} ms")
    t0 = time.perf_counter()
    r = one
    for _ in range(200):
        r = tiny(r)
    r.block_until_ready()
    print(f"pipelined dispatch rate: {(time.perf_counter() - t0) / 200 * 1e3:.3f} ms/call")

    # ---- chained matmul peaks ----------------------------------------------
    def matmul_peak(dt, acc_dt, n=4096):
        a = device_materialize(jnp.ones((n, n), dt))
        b = device_materialize(jnp.ones((n, n), dt))

        def body(i, carry):
            c = lax.dot_general(carry, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=acc_dt)
            # renormalize back to the input dtype with a data dependency
            return (c & 1).astype(dt) if jnp.issubdtype(dt, jnp.integer) else (
                jnp.clip(c, -1.0, 1.0).astype(dt)  # data-dependent, bounded
            )

        f = jax.jit(lambda a: lax.fori_loop(0, K, body, a))
        dt_s = timeit(f, a) / K
        return 2 * n**3 / dt_s / 1e12

    print(f"int8 matmul 4096^3 chained: {matmul_peak(jnp.int8, jnp.int32):,.0f} TOPS")
    print(f"bf16 matmul 4096^3 chained: {matmul_peak(jnp.bfloat16, jnp.float32):,.0f} TFLOPS")

    # ---- chained conv ------------------------------------------------------
    def conv_peak(dt, acc_dt, b=64, hw=56, c=128):
        x = device_materialize(jnp.ones((b, hw, hw, c), dt))
        w = device_materialize(jnp.ones((3, 3, c, c), dt))

        def body(i, carry):
            y = lax.conv_general_dilated(
                carry, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dt,
            )
            return (y & 1).astype(dt) if jnp.issubdtype(dt, jnp.integer) else (
                jnp.clip(y, -1.0, 1.0).astype(dt)
            )

        f = jax.jit(lambda x: lax.fori_loop(0, K, body, x))
        dt_s = timeit(f, x) / K
        flops = 2 * b * hw * hw * c * c * 9
        return flops / dt_s / 1e12

    print(f"int8 conv3x3 (64,56,56,128) chained: {conv_peak(jnp.int8, jnp.int32):,.0f} TOPS")
    print(f"bf16 conv3x3 (64,56,56,128) chained: {conv_peak(jnp.bfloat16, jnp.float32):,.0f} TFLOPS")

    # ---- full int8 model, chained ------------------------------------------
    import logging

    from inference_efficient_vision_models_tpu.compress.prune import prune_model
    from inference_efficient_vision_models_tpu.compress.quant import qresnet
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.data.synthetic import (
        make_synthetic_neudet,
    )
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    class Cfg:
        batch_size = 64
        calibration_images = 64
        DEBUG_MODE = False
        image_size = (224, 224)
        compute_dtype = "bfloat16"

    with jax.default_device(cpu_device()):
        spec, params, state = create_model("resnet18", num_classes=6)
        pspec, pparams, pstate = prune_model(
            spec, params, state, ratio=0.11, method="l2", round_to=8
        )
    eng = QuantizationEngine(Cfg(), pspec, pparams, pstate, logging.getLogger("p"))
    qmodel, _ = eng.static_quantize(make_synthetic_neudet(16, 224, seed=0))
    qmodel = device_materialize(qmodel)

    def chained_model(batch):
        x0 = device_materialize(jnp.asarray(space_to_depth_u8(
            np.random.default_rng(0).integers(0, 255, (batch, 224, 224, 3)).astype(np.uint8)
        )))

        def body(i, x):
            logits = qresnet.apply_int8(pspec, qmodel, x)
            bump = (jnp.sum(logits) > 0).astype(x.dtype)  # data dependency
            return x + bump

        f = jax.jit(lambda x: lax.fori_loop(0, K, body, x))
        return timeit(f, x0) / K

    for batch in (256, 64, 8, 1):
        dt_s = chained_model(batch)
        print(f"int8 full model chained, batch {batch:4d}: {dt_s * 1e3:8.3f} ms/batch "
              f"({batch / dt_s:,.0f} img/s, {dt_s / batch * 1e3:.3f} ms/img)")


if __name__ == "__main__":
    main()
