#!/usr/bin/env python
"""A/B the channel-importance criteria on the real stage-2 student.

For each importance method (reference menu: l1/l2/random/taylor/group_norm;
extensions: bn_act/apoz — see compress/prune/importance.py), prune the r2
distilled ResNet18 student at a stress ratio (default 0.30, round_to=8),
and report test accuracy BEFORE fine-tuning (the criterion's own signal)
and after a short fine-tune (what survives recovery). Feeds the REPORT.md
"importance criteria" table.

Usage: python scripts/prune_criteria_ab.py [ratio] [ft_epochs] [fold] [key=value ...]

Extra ``key=value`` args override PruningConfig — e.g. the discriminative
surrogate protocol (VERDICT r3 item 2):

    python scripts/prune_criteria_ab.py 0.30 1 0 source_exp_name=h1 \
        num_classes=12 synthetic_variant=hard synthetic_size=600
"""
import sys, json, logging

sys.path.insert(0, ".")

from inference_efficient_vision_models_tpu.core.config import PruningConfig
from inference_efficient_vision_models_tpu.cli.common import setup_stage, fold_arrays
from inference_efficient_vision_models_tpu.cli.teacher import load_stage_model
from inference_efficient_vision_models_tpu.cli.prune import StructuredPruningEngine
from inference_efficient_vision_models_tpu.compress.prune.engine import (
    taylor_grads_accumulated,
)
from inference_efficient_vision_models_tpu.data.pipeline import Batches

METHODS = ("l2", "l1", "group_norm", "taylor", "random", "bn_act", "apoz")


def main():
    pos = [a for a in sys.argv[1:] if "=" not in a]
    ratio = float(pos[0]) if len(pos) > 0 else 0.30
    ft_epochs = int(pos[1]) if len(pos) > 1 else 1
    fold = int(pos[2]) if len(pos) > 2 else 0
    from inference_efficient_vision_models_tpu.cli.common import parse_cli_kwargs

    overrides = parse_cli_kwargs([a for a in sys.argv[1:] if "=" in a])

    cfg = PruningConfig(**{
        "experiment_name": "criteria_ab",
        "source_exp_name": "r2",
        "pruning_ratio": ratio,
        "round_to": 8,
        "finetune_epochs": ft_epochs,
        "folds": fold,
        **overrides,
    })
    logger, _, data, split = setup_stage(cfg)
    logging.getLogger().setLevel(logging.WARNING)  # quiet the per-eval chatter
    train_d, val_d, test_d = fold_arrays(data, split, fold)
    src = f"{cfg.student_exp_path}/fold_{fold}"

    rows = []
    for method in METHODS:
        cfg.pruning_method = method
        spec, params, state = load_stage_model(src, cfg.test_ckpt_type)
        engine = StructuredPruningEngine(cfg, spec, params, state, logger)
        grads = None
        if method == "taylor":
            # mean gradient over cfg.taylor_batches batches (a single batch —
            # the reference's effective budget — made taylor pure noise)
            it = iter(Batches(train_d[0], train_d[1], cfg.batch_size))
            batches = [b for _, b in zip(range(cfg.taylor_batches), it)]
            grads = taylor_grads_accumulated(spec, params, state, batches)
        engine.prune_model(grads=grads)
        engine.recalibrate(train_d)
        m0 = engine.evaluate_metrics(test_d, f"{method}/pruned")
        row = {
            "method": method,
            "acc_pruned": round(m0["Accuracy"], 2),
            "params_M": round(m0["Params (M)"], 3),
            "widths": list(engine.spec.stage_widths),
        }
        if ft_epochs > 0:
            engine.finetune(train_d, val_d, f"{cfg.output_dir}/ab_{method}")
            m1 = engine.evaluate_metrics(test_d, f"{method}/pruned+ft")
            row["acc_ft"] = round(m1["Accuracy"], 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| method | acc after prune | acc after FT | params (M) |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['method']} | {r['acc_pruned']:.2f} | "
            f"{r.get('acc_ft', float('nan')):.2f} | {r['params_M']:.2f} |"
        )


if __name__ == "__main__":
    main()
