#!/usr/bin/env python
"""Per-stage on-TPU breakdown of the static-int8 pruned ResNet18 forward.

Isolated-op microbenchmarks are untrustworthy over the axon tunnel (up to
10x run-to-run variance). This measures whole-model TRUNCATIONS — the model
cut after the stem / each stage / the head — interleaved round-robin across
repeats, so every variant sees the same noise distribution. Stage cost =
delta between consecutive truncations.

Also A/Bs the full forward against candidate optimizations and prints a
simple roofline: achieved int8 OPS vs measured MXU peak.

Usage: python scripts/profile_int8.py [batch=256] [rounds=5]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from inference_efficient_vision_models_tpu.compress.prune import prune_model
    from inference_efficient_vision_models_tpu.compress.quant import qresnet
    from inference_efficient_vision_models_tpu.compress.quant.engine import (
        QuantizationEngine,
    )
    from inference_efficient_vision_models_tpu.data.synthetic import (
        make_synthetic_neudet,
    )
    from inference_efficient_vision_models_tpu.data.pipeline import normalize_images
    from inference_efficient_vision_models_tpu.models import create_model
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )
    from inference_efficient_vision_models_tpu.utils import (
        cpu_device,
        device_materialize,
        enable_compilation_cache,
    )

    enable_compilation_cache()
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    BATCH = int(kv.get("batch", 256))
    ROUNDS = int(kv.get("rounds", 5))
    ITERS = int(kv.get("iters", 20))

    class Cfg:
        batch_size = 64
        calibration_images = 64
        DEBUG_MODE = False
        image_size = (224, 224)
        compute_dtype = "bfloat16"

    import logging

    with jax.default_device(cpu_device()):
        spec, params, state = create_model("resnet18", num_classes=6)
        pspec, pparams, pstate = prune_model(
            spec, params, state, ratio=0.11, method="l2", round_to=8
        )
    eng = QuantizationEngine(Cfg(), pspec, pparams, pstate, logging.getLogger("p"))
    calib = make_synthetic_neudet(16, 224, seed=0)
    qmodel, _ = eng.static_quantize(calib)
    qmodel = device_materialize(qmodel)
    folded = device_materialize(eng.folded)

    x_full = np.random.default_rng(0).integers(0, 255, (BATCH, 224, 224, 3)).astype(np.uint8)
    x_s2d = jnp.asarray(space_to_depth_u8(x_full))
    x_u8 = jnp.asarray(x_full)

    # ---- truncated int8 forwards -----------------------------------------
    def int8_trunc(upto):  # upto: 0=stem+pool, 1..4 = after layer{n}, 5=full
        def fn(q, x):
            return _apply_int8_trunc(pspec, q, x, upto)
        return fn

    def _apply_int8_trunc(spec_, q, x, upto):
        # mirror qresnet.apply_int8 structure, stopping early
        from inference_efficient_vision_models_tpu.compress.quant.qresnet import (
            _conv_q, _max_pool, _requant,
        )
        from inference_efficient_vision_models_tpu.compress.quant.observers import (
            dequantize_affine_shifted, quantize_affine_shifted,
        )
        stem = q["stem"]
        x_sn = (x.astype(jnp.int32) - 128).astype(jnp.int8)
        x_p = jnp.pad(x_sn, ((0, 0), (2, 1), (2, 1), (0, 0)), constant_values=jnp.int8(-128))
        acc = lax.conv_general_dilated(
            x_p, stem["w4_q"], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * stem["w4_scale"] + stem["bias"] + stem["e4"]
        cur = _requant(jax.nn.relu(y), stem["out_scale"], stem["out_zp"])
        cur = _max_pool(cur, jnp.int8(-128))
        cur_scale, cur_zp = stem["out_scale"], stem["out_zp"]
        if upto == 0:
            return jnp.sum(cur.astype(jnp.int32))
        kw = dict(impl="lax", interpret=False)
        for s, depth in enumerate(pspec.depths):
            if s + 1 > upto:
                return jnp.sum(cur.astype(jnp.int32))
            for b in range(depth):
                blk = q[f"layer{s + 1}"][str(b)]
                stride = pspec.block_stride(s, b)
                in_s, in_z = cur_scale, cur_zp
                x_in = cur
                a_q = _conv_q(x_in, in_z, in_s, blk["conv1"], stride, 1,
                              relu=True, requant=True, **kw)
                h = _conv_q(a_q, blk["conv1"]["out_zp"], blk["conv1"]["out_scale"],
                            blk["conv2"], 1, 1, relu=False, requant=False, **kw)
                if "down" in blk:
                    identity = _conv_q(x_in, in_z, in_s, blk["down"], stride, 0,
                                       relu=False, requant=False, **kw)
                else:
                    identity = dequantize_affine_shifted(x_in, in_s, in_z)
                t = jax.nn.relu(h + identity)
                cur = _requant(t, blk["out_scale"], blk["out_zp"])
                cur_scale, cur_zp = blk["out_scale"], blk["out_zp"]
        # head
        feats = jnp.mean(dequantize_affine_shifted(cur, cur_scale, cur_zp), axis=(1, 2))
        fc = q["fc"]
        f_q = quantize_affine_shifted(feats, fc["in_scale"], fc["in_zp"])
        acc2 = lax.dot_general(f_q, fc["w_q"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
        acc2 = acc2 - (fc["in_zp"] - 128) * fc["w_sum"]
        logits = acc2.astype(jnp.float32) * (fc["in_scale"] * fc["w_scale"]) + fc["bias"]
        return jnp.sum(logits)

    variants = {}
    for upto in range(6):
        name = ["stem", "l1", "l2", "l3", "l4", "full"][upto]
        fn = jax.jit(int8_trunc(upto))
        variants[f"int8_{name}"] = (fn, qmodel, x_s2d)

    # float reference points
    def float_fn(dtype):
        m = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, folded
        )
        m = device_materialize(m)
        return (
            jax.jit(lambda mm, x: jnp.sum(
                qresnet.apply_folded(pspec, mm, normalize_images(x, dtype)).astype(jnp.float32)
            )),
            m,
            x_u8,
        )

    variants["fp32_full"] = float_fn(jnp.float32)
    variants["bf16_full"] = float_fn(jnp.bfloat16)

    # warmup all
    for name, (fn, m, x) in variants.items():
        r = fn(m, x)
    jax.block_until_ready(r)

    # interleaved rounds
    times = {name: [] for name in variants}
    for _ in range(ROUNDS):
        for name, (fn, m, x) in variants.items():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                r = fn(m, x)
            r.block_until_ready()
            times[name].append((time.perf_counter() - t0) / ITERS * 1e3)

    best = {name: min(v) for name, v in times.items()}
    print(f"\nbatch={BATCH}, best-of-{ROUNDS} rounds of {ITERS} iters (ms/batch):")
    prev = 0.0
    for name in ["int8_stem", "int8_l1", "int8_l2", "int8_l3", "int8_l4", "int8_full"]:
        t = best[name]
        print(f"  {name:12s} {t:8.3f}   (+{t - prev:6.3f})")
        prev = t
    for name in ["fp32_full", "bf16_full"]:
        print(f"  {name:12s} {best[name]:8.3f}")
    ips = BATCH / best["int8_full"] * 1e3
    print(f"\nint8 full: {ips:,.0f} img/s   "
          f"ratio vs fp32 {best['fp32_full'] / best['int8_full']:.2f}x   "
          f"vs bf16 {best['bf16_full'] / best['int8_full']:.2f}x")

    # measured MXU peaks for the roofline
    for dt, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        n = 4096
        a = jnp.ones((n, n), dt)
        bmat = jnp.ones((n, n), dt)
        f = jax.jit(lambda a, b: lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if dt == jnp.int8 else jnp.float32,
        ))
        r = f(a, bmat); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(a, bmat)
        r.block_until_ready()
        dt_s = (time.perf_counter() - t0) / 20
        print(f"{name} matmul 4096^3: {2 * n**3 / dt_s / 1e12:,.0f} T(FL)OPS")


if __name__ == "__main__":
    main()
