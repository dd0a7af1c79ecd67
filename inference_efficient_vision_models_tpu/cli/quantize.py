"""Stage 4: post-training quantization.

TPU-native rebuild of `quantization/main.py` (reference :57-336): per fold,
load the chosen upstream model (teacher / student / pruned — pruned models
reconstruct from their width-descriptor JSON instead of the reference's
full-module pickle), build a ≤256-image calibration set from the fold's own
train split, run all quantization methods, measure size + accuracy (+
latency/throughput on TPU), save quantized artifacts, and emit the summary
table + CSV.
"""

from __future__ import annotations

import os
import traceback

import jax.numpy as jnp
from flax import serialization

from ..core import QuantConfig
from ..compress.quant.engine import QuantizationEngine
from ..metrics.report import summarize_folds
from .teacher import load_stage_model


def _source_dir(cfg, fold: int) -> str:
    root = {
        "teacher": cfg.teacher_exp_path,
        "student": cfg.student_exp_path,
        "pruned": cfg.pruning_exp_path,
    }[cfg.model_type]
    return os.path.join(root, f"fold_{fold}")


def _save_qmodel(fold_dir: str, method: str, model, spec=None) -> str:
    os.makedirs(fold_dir, exist_ok=True)
    import json

    import jax

    from ..compress.quant import quant_module

    path = os.path.join(fold_dir, f"model_{method}.msgpack")
    with open(path, "wb") as f:
        f.write(
            serialization.to_bytes(quant_module(spec).serializable(jax.device_get(model)))
        )
    if spec is not None:
        with open(os.path.join(fold_dir, "spec.json"), "w") as f:
            json.dump(spec.to_dict(), f, indent=2)
    return path


def run_test(cfg, logger, data):
    """choice=2: reload saved quantized artifacts and re-evaluate (the
    checkpoint round-trip check every other stage has; the reference's
    quantization choice field was unused, `q_config.py:57`)."""
    from .common import iter_folds

    from ..compress.quant import quant_module
    from ..compress.quant.engine import evaluate_accuracy_fn
    from ..metrics.profile import model_size_bytes
    from ..serving import load_quantized

    rows = []
    for fold in iter_folds(cfg):
        fold_dir = cfg.fold_dir(fold)
        if not os.path.exists(os.path.join(fold_dir, "spec.json")):
            logger.warning("fold %d: no quantized artifacts — skipping", fold)
            continue
        for method in cfg.methods:
            if not os.path.exists(os.path.join(fold_dir, f"model_{method}.msgpack")):
                continue
            spec, model, fn, pre = load_quantized(fold_dir, method)
            acc = evaluate_accuracy_fn(cfg, fn, data["test"], host_preprocess=pre)
            size_mb = model_size_bytes(quant_module(spec).serializable(model)) / 1e6
            rows.append({
                "fold": fold, "method": method,
                "Accuracy": acc * 100.0, "Size (MB)": size_mb,
            })
            logger.info("fold %d %s: acc %.2f%% size %.2f MB", fold, method, acc * 100, size_mb)
    summarize_folds(rows, cfg.output_dir, logger, name="quantization_summary")
    return rows


def run_quantize(cfg, logger, data, split):
    from .common import fold_arrays, iter_folds

    rows = []
    for fold in iter_folds(cfg):
        logger.info("===== fold %d/%d (%s) =====", fold, cfg.num_folds - 1, cfg.model_type)
        src = _source_dir(cfg, fold)
        try:
            spec, params, state = load_stage_model(src, cfg.test_ckpt_type)
        except FileNotFoundError:
            logger.warning("fold %d: %s model missing in %s — skipping", fold, cfg.model_type, src)
            continue
        train_d, val_d, test_d = fold_arrays(data, split, fold)
        calib = (
            train_d[0][: cfg.calibration_images],
            train_d[1][: cfg.calibration_images],
        )

        engine = QuantizationEngine(cfg, spec, params, state, logger)
        fp32_mb = engine.size_mb(engine.folded)

        methods = {
            "fp32": lambda: (engine.folded, None),
            "static_int8": lambda: engine.static_quantize(calib, train_data=train_d),
            # mixed executor over the same int8 conversion (MBConv families)
            "static_int8_mixed": lambda: engine.static_quantize(
                calib, train_data=train_d, executor="mixed"
            ),
            # bf16 activation carrier over the same int8 conversion (ViTs)
            "static_int8_bf16": lambda: engine.static_quantize(
                calib, train_data=train_d, executor="bf16"
            ),
            "dynamic_int8": lambda: engine.dynamic_quantize(),
            "fp16": lambda: engine.cast_half(jnp.float16),
            "bf16": lambda: engine.cast_half(jnp.bfloat16),
            "weight_only_int8": lambda: engine.weight_only_quantize(
                train_data=train_d
            ),
            "weight_only_int4": lambda: engine.weight_only_quantize(
                bits=4, train_data=train_d
            ),
        }
        wanted = ("fp32",) + tuple(cfg.methods)
        for method in wanted:
            if method not in methods:
                logger.warning("unknown method %s — skipping", method)
                continue
            try:
                model, fn = methods[method]()
                if fn is None:  # fp32 baseline forward (raw u8 in, like all fns)
                    import functools
                    import jax

                    from ..data.pipeline import normalize_images
                    from ..utils import device_materialize

                    spec_, qmod = spec, engine.q
                    jfn = jax.jit(
                        lambda m, x_u8: qmod.apply_folded(
                            spec_, m, normalize_images(x_u8)
                        )
                    )
                    model = device_materialize(model)
                    fn = functools.partial(jfn, model)
                pre = engine.static_preprocess(method)
                acc = engine.evaluate_accuracy(fn, test_d, host_preprocess=pre)
                size_mb = engine.size_mb(model)
                lat = engine.measure_latency(fn, batch_size=1, host_preprocess=pre)
                thr = engine.measure_latency(
                    fn, batch_size=cfg.batch_size, host_preprocess=pre
                )
                if method != "fp32":
                    _save_qmodel(cfg.fold_dir(fold), method, model, spec=spec)
                rows.append({
                    "fold": fold,
                    "method": method,
                    "Accuracy": acc * 100.0,
                    "Size (MB)": size_mb,
                    "Compression": fp32_mb / max(size_mb, 1e-9),
                    "p50 latency (ms)": lat["p50"],
                    "throughput (img/s)": thr["throughput_ips"],
                })
                logger.info(
                    "%s: acc %.2f%% size %.2f MB (%.2fx) p50 %.2f ms bs%d %.0f img/s",
                    method, acc * 100, size_mb, fp32_mb / max(size_mb, 1e-9),
                    lat["p50"], cfg.batch_size, thr["throughput_ips"],
                )
            except Exception as e:  # reference catches per-method, :310-314
                logger.error("method %s failed: %s", method, e)
                logger.error(traceback.format_exc())
        from ..core.provenance import stage_record, write_provenance

        write_provenance(cfg.fold_dir(fold), stage_record(
            cfg, "quantization", fold, source_dir=src,
            model_type=cfg.model_type, spec_name=spec.name,
            num_classes=int(spec.num_classes),
            stage_widths=[int(w) for w in getattr(spec, "stage_widths", ())] or None,
            observer=cfg.observer, qat_epochs=cfg.qat_epochs,
            adaround_iters=cfg.adaround_iters,
            calibration_images=cfg.calibration_images,
            methods=list(cfg.methods),
        ))
        if getattr(cfg, "sensitivity", False):
            try:
                import pandas as pd

                srows = engine.sensitivity(calib, eval_data=test_d)
                sp = os.path.join(cfg.output_dir, f"sensitivity_fold{fold}.csv")
                pd.DataFrame(srows).to_csv(sp, index=False)
                logger.info("wrote %s", sp)
            except Exception as e:  # same isolation as the methods
                logger.error("sensitivity sweep failed: %s", e)
                logger.error(traceback.format_exc())
        if getattr(cfg, "automix", False):
            try:
                import pandas as pd

                float_taps, ladder = engine.auto_mixed(calib, eval_data=test_d)
                ap = os.path.join(cfg.output_dir, f"automix_fold{fold}.csv")
                pd.DataFrame(
                    [{**r, "float_taps": ";".join(r["float_taps"])} for r in ladder]
                ).to_csv(ap, index=False)
                logger.info(
                    "automix policy: %d float tap(s) %s → wrote %s",
                    len(float_taps), float_taps, ap,
                )
            except Exception as e:  # same isolation as the methods
                logger.error("automix search failed: %s", e)
                logger.error(traceback.format_exc())
    summarize_folds(rows, cfg.output_dir, logger, name="quantization_summary")
    return rows


def main(argv=None):
    from .common import make_config, setup_stage

    cfg = make_config(QuantConfig, argv)
    logger, _, data, split = setup_stage(cfg)
    if cfg.choice == 2:
        return run_test(cfg, logger, data)
    return run_quantize(cfg, logger, data, split)
