#!/usr/bin/env python
"""Per-block compile probe for the fused MBConv kernel on the real chip.

Maps Mosaic's lowering envelope: for every stride-1 block of the pruned
EfficientNet-B0 / MobileNetV2 int8 models, jit-compile the fused kernel in
isolation and report ok / the failure class. Drives the fallback predicate
in compress/quant/fusedpath (blocks outside the envelope run the unfused
op chain).
"""
import sys, logging, traceback
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from inference_efficient_vision_models_tpu.models import create_model
from inference_efficient_vision_models_tpu.compress.prune import prune_model
from inference_efficient_vision_models_tpu.compress.quant.engine import QuantizationEngine
from inference_efficient_vision_models_tpu.compress.quant import fusedpath
from inference_efficient_vision_models_tpu.data.synthetic import make_synthetic_neudet
from inference_efficient_vision_models_tpu.core.config import QuantConfig
from inference_efficient_vision_models_tpu.ops.fused_mbconv import fused_mbconv_block
from inference_efficient_vision_models_tpu.utils import device_materialize, enable_compilation_cache
enable_compilation_cache()

for name in ("efficientnet_b0", "mobilenet_v2"):
    with jax.default_device(jax.devices("cpu")[0]):
        spec, params, state = create_model(name, num_classes=6)
        pspec, pp, ps = prune_model(spec, params, state, ratio=0.1, method="l2", round_to=8)
    cfg = QuantConfig(batch_size=16, calibration_images=16)
    eng = QuantizationEngine(cfg, pspec, pp, ps, logging.getLogger("v"))
    qmodel, _ = eng.static_quantize(make_synthetic_neudet(16, 224, seed=0))
    qf = device_materialize(fusedpath.pack_fused(pspec, qmodel))

    # walk blocks, tracking input resolution like apply_int8 does
    res = 224 // 2  # after stem (stride 2)
    if name == "efficientnet_b0":
        act = "silu"
    else:
        act = "relu6"
        res = res  # mbv2 stem also stride 2
    for s, depth in enumerate(pspec.depths):
        k = pspec.stage_kernels[s] if hasattr(pspec, "stage_kernels") else 3
        for b in range(depth):
            stride = pspec.block_stride(s, b)
            if stride != 1:
                res //= 2
                continue
            pk = qf[f"s{s}b{b}"]
            cin = int(pk["we"].shape[0]) if "we" in pk else int(pk["wdw"].shape[-1])
            ce = int(pk["wdw"].shape[-1])
            co = int(pk["wp"].shape[-1])
            x = device_materialize(jnp.zeros((8, res, res, cin), jnp.int8))
            xr = (
                device_materialize(jnp.zeros((8, res, res, co), jnp.int8))
                if pspec.has_residual(s, b) else None
            )
            tag = f"{name} s{s}b{b} {res}^2 k{k} cin{cin} ce{ce} co{co}"
            try:
                y = jax.jit(lambda xx, rr: fused_mbconv_block(
                    xx, pk, kernel=k, stride=1, act=act, x_res=rr))(x, xr)
                y.block_until_ready()
                print(f"OK    {tag}", flush=True)
            except Exception as e:
                msg = str(e).split("\n")
                key = next((l for l in msg if "vector" in l or "vmem" in l
                            or "Scoped" in l or "NotImplemented" in l), msg[0])
                print(f"FAIL  {tag}\n      {key[:200]}", flush=True)
