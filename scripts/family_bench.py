#!/usr/bin/env python
"""Family x method serving sweep on one TPU chip.

Reproduces REPORT.md's "Family x method serving" table: each model family
(~10% structured-pruned, round_to=8) timed bf16 / weight-only-int8 (W8A16) /
static-int8 with fori_loop-CHAINED programs at batch 256 (dispatch
amortized; see scripts/device_time.py for why per-call timing over the axon
tunnel is unusable). Sizes are serialized-artifact MB.

Usage: python scripts/family_bench.py [model_name ...]
       (default: resnet18 mobilenet_v2 efficientnet_b0 vit_small_patch16_224
        resnext26_32x4d)
"""
import sys, time, logging
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.compress.prune import prune_model
from inference_efficient_vision_models_tpu.compress.quant.engine import QuantizationEngine
from inference_efficient_vision_models_tpu.compress.quant import wo4, wo8
from inference_efficient_vision_models_tpu.data.synthetic import make_synthetic_neudet
from inference_efficient_vision_models_tpu.ops.space_to_depth import space_to_depth_u8
from inference_efficient_vision_models_tpu.models.widths import ResNetSpec
from inference_efficient_vision_models_tpu.utils import device_materialize, enable_compilation_cache
enable_compilation_cache()

from inference_efficient_vision_models_tpu.core.config import QuantConfig

def chain(body, k):
    def b(i, x):
        out = body(x)
        return x + (jnp.sum(out.astype(jnp.float32)) > 0).astype(x.dtype)
    return jax.jit(lambda x: lax.fori_loop(0, k, b, x))

def _timeit_once(fn, x, iters=5):
    # median over >=5 rounds; force end-to-end delivery of ONE SCALAR via a
    # device-side slice (jnp indexing) — np.asarray(r) would transfer the
    # whole carrier array over the axon tunnel (154 MB for fp32 b256) and
    # dominate the measurement; block_until_ready alone can return absurdly
    # early (verify skill / scripts/device_time.py)
    r = fn(x); float(jnp.ravel(r)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(x)
        float(jnp.ravel(r)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))

def timeit(body, x, k=16, iters=5):
    # per-iteration device time from the K vs 2K chained difference: the
    # constant per-call overhead (dispatch + tunnel round trip + scalar
    # fetch) cancels — same protocol as bench.py:_chained_ms
    t_k = _timeit_once(chain(body, k), x, iters)
    t_2k = _timeit_once(chain(body, 2 * k), x, iters)
    return max(t_2k - t_k, 1e-9) / k * 1e3

B = 256
x_np = np.random.default_rng(0).integers(0, 255, (B, 224, 224, 3)).astype(np.uint8)
DEFAULT = ("resnet18", "mobilenet_v2", "efficientnet_b0",
           "vit_small_patch16_224", "resnext26_32x4d")
for name in (tuple(sys.argv[1:]) or DEFAULT):
    with jax.default_device(jax.devices("cpu")[0]):
        spec, params, state = create_model(name, num_classes=6)
        pspec, pp, ps = prune_model(spec, params, state, ratio=0.11 if name == "resnet18" else 0.1,
                                    method="l2", round_to=8)
    cfg = QuantConfig(batch_size=64, calibration_images=64)
    eng = QuantizationEngine(cfg, pspec, pp, ps, logging.getLogger("v"))
    qmod = eng.q
    qmodel, _ = eng.static_quantize(make_synthetic_neudet(32, 224, seed=0))
    qmodel = device_materialize(qmodel)
    wmodel = device_materialize(wo8.convert_weight_only(eng.folded))
    w4model = device_materialize(wo4.convert_weight_only_int4(eng.folded))
    fold16 = device_materialize(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, eng.folded))
    if isinstance(pspec, ResNetSpec):
        x_int8 = device_materialize(jnp.asarray(space_to_depth_u8(x_np)))
    else:
        x_int8 = device_materialize(jnp.asarray(x_np))
    xf = device_materialize(jnp.asarray(x_np).astype(jnp.float32))
    rows = {}
    rows["bf16"] = timeit(
        lambda xx: qmod.apply_folded(pspec, fold16, xx.astype(jnp.bfloat16) / 255.0), xf)
    rows["w8a16"] = timeit(
        lambda xx: qmod.apply_folded(pspec, wo8.dequantize(wmodel, jnp.bfloat16),
                                     xx.astype(jnp.bfloat16) / 255.0), xf)
    rows["w4a16"] = timeit(
        lambda xx: qmod.apply_folded(pspec, wo4.dequantize(w4model, jnp.bfloat16),
                                     xx.astype(jnp.bfloat16) / 255.0), xf)
    # s2d-folded uint8 stem variants (normalize+stem fused, no 3-lane tensor)
    from inference_efficient_vision_models_tpu.compress.quant import stemfold
    from inference_efficient_vision_models_tpu.compress.quant.engine import float_stem_spec
    scfg = float_stem_spec(pspec)
    if scfg is not None:
        key, sstride, spad, sact = scfg
        sfn16 = stemfold.make_float_stem_s2d(
            eng.folded[key]["w"], eng.folded[key]["b"],
            stride=sstride, padding=spad, act=sact, dtype=jnp.bfloat16)
        rows["bf16s2d"] = timeit(
            lambda xx: qmod.apply_folded(pspec, fold16, None, stem_out=sfn16(xx)), x_int8)
        rows["w8s2d"] = timeit(
            lambda xx: qmod.apply_folded(pspec, wo8.dequantize(wmodel, jnp.bfloat16),
                                         None, stem_out=sfn16(xx)), x_int8)
    rows["int8"] = timeit(lambda xx: qmod.apply_int8(pspec, qmodel, xx), x_int8)
    if hasattr(qmod, "apply_int8_mixed"):  # MBConv: int8 1x1 + bf16 dw
        rows["int8mx"] = timeit(
            lambda xx: qmod.apply_int8_mixed(pspec, qmodel, xx), x_int8)
    if hasattr(qmod, "apply_int8_bf16"):  # ViT: bf16 activation carrier
        rows["int8bf"] = timeit(
            lambda xx: qmod.apply_int8_bf16(pspec, qmodel, xx), x_int8)
    sizes = {"bf16": eng.size_mb(fold16), "w8a16": eng.size_mb(wmodel),
             "w4a16": eng.size_mb(w4model),
             "bf16s2d": eng.size_mb(fold16), "w8s2d": eng.size_mb(wmodel),
             "int8": eng.size_mb(qmodel), "int8mx": eng.size_mb(qmodel),
             "int8bf": eng.size_mb(qmodel),
             "fp32": eng.size_mb(eng.folded)}
    for m, ms in rows.items():
        print(f"{name:16s} {m:6s} {ms:7.2f} ms/b{B}  {B/ms*1e3:10,.0f} img/s  {sizes[m]:6.2f} MB")
    print(f"{name:16s} fp32 size {sizes['fp32']:.2f} MB")
