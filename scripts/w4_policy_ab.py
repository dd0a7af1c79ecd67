#!/usr/bin/env python
"""W4A16 int8-fallback policy A/B on the real ef2 pruned artifacts.

ef2 measured int4-everything at −22 pts vs fp32 (W8A16: −0.5). This
isolates the culprit leaf classes by evaluating, on the same fold
checkpoints and test split:

    fp32       folded baseline
    w4-all     int4 every packable weight (the pre-fix behavior)
    w4-dw8     int4 except depthwise kernels (int8)
    w4-stem8   int4 except tiny-reduction kernels r<32 (stem)
    w4-auto    the shipped policy (depthwise + r<32 both int8)

Runs on whatever backend is active (CPU works: W4 dequantizes to float,
no int8 grouped convs). Usage: python scripts/w4_policy_ab.py [n_folds]
"""
import json
import logging
import os
import sys

sys.path.insert(0, ".")
import numpy as np

import jax

if "--cpu" in sys.argv:  # run off-chip (e.g. while the TPU is busy)
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")
import jax.numpy as jnp

from inference_efficient_vision_models_tpu.compress.quant import wo4
from inference_efficient_vision_models_tpu.compress.quant.engine import (
    QuantizationEngine,
)
from inference_efficient_vision_models_tpu.core import artifacts
from inference_efficient_vision_models_tpu.core.config import QuantConfig
from inference_efficient_vision_models_tpu.data import load_dataset
from inference_efficient_vision_models_tpu.data.pipeline import normalize_images
from inference_efficient_vision_models_tpu.utils import (
    device_materialize,
    enable_compilation_cache,
)

enable_compilation_cache()
logging.basicConfig(level=logging.INFO)
log = logging.getLogger("w4ab")

N_FOLDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
BS = 32

cfg = QuantConfig(
    experiment_name="ef2", model_type="pruned", pruning_exp_name="ef2",
    student_model="efficientnet_b0", choice=2, synthetic_size=600,
    num_folds=5,
)
test_imgs, test_labels = load_dataset(cfg, log)["test"]
n = (min(len(test_imgs), 512) // BS) * BS

POLICIES = {
    # (policy, max_group): finer groups = more scales = finer int4 grid
    "w4-all": (lambda p, a: False, 64),
    "w4-dw8": (lambda p, a: a.ndim == 4 and a.shape[2] == 1, 64),
    "w4-auto": (wo4._keep_int8_auto, 64),
    "w4-all-g16": (lambda p, a: False, 16),
    "w4-auto-g16": (wo4._keep_int8_auto, 16),
    "w4-auto-g8": (wo4._keep_int8_auto, 8),
}


def accuracy(fn):
    preds = []
    for i in range(0, n, BS):
        preds.append(np.asarray(fn(jnp.asarray(test_imgs[i : i + BS]))).argmax(1))
    return float((np.concatenate(preds) == test_labels[:n]).mean())


sums = {}
for fold in range(N_FOLDS):
    fold_dir = f"output/pruning/ef2/fold_{fold}"
    raw = artifacts.load_checkpoint_raw(fold_dir, "best")
    from inference_efficient_vision_models_tpu.models.registry import spec_from_dict

    with open(os.path.join(fold_dir, "model_best.spec.json")) as f:
        spec = spec_from_dict(json.load(f))
    eng = QuantizationEngine(cfg, spec, raw["params"], raw["state"], log)
    qmod = eng.q
    folded = device_materialize(eng.folded)
    fp32_fn = jax.jit(
        lambda x_u8: qmod.apply_folded(spec, folded, normalize_images(x_u8))
    )
    row = {"fp32": accuracy(fp32_fn)}
    for name, (pol, g) in POLICIES.items():
        wo4._MAX_GROUP = g
        m = device_materialize(
            wo4.convert_weight_only_int4(jax.device_get(folded), keep_int8=pol)
        )
        wo4._MAX_GROUP = 64
        fn = jax.jit(
            lambda x_u8, m=m: qmod.apply_folded(
                spec, wo4.dequantize(m, jnp.bfloat16),
                normalize_images(x_u8, jnp.bfloat16),
            )
        )
        row[name] = accuracy(fn)
        row[f"{name}_mb"] = eng.size_mb(m)
    log.info("fold %d: %s", fold, {k: (round(v, 4)) for k, v in row.items()})
    for k, v in row.items():
        sums.setdefault(k, []).append(v)

for k, v in sums.items():
    log.info("MEAN %-10s %.4f", k, float(np.mean(v)))
