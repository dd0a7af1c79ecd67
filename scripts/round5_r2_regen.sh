#!/bin/bash
# Round-5: regenerate ONLY the flagship ResNet r2 pipeline, all 5 folds
# (the r2 slice of scripts/regen_pipelines.sh). Purpose:
#   * complete per-fold stage CSVs for scripts/collect_summary.py (the
#     consolidated workbook — the committed release artifact covers fold 0
#     only),
#   * fresh output/ artifacts carrying the round-5 provenance.json chain,
#     exercising bench.py's identity-based selection on the
#     output-beats-committed path end-to-end.
# ~25 min on the one chip (compile-cache warm).
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"

timeout 3000 python teacher_training/main.py       choice=1 experiment_name=r2 $COMMON epochs=8 learning_rate=3e-4 || exit 1
timeout 3000 python knowledge_distillation/main.py choice=1 experiment_name=r2 teacher_exp_name=r2 $COMMON epochs=8 learning_rate=3e-4 || exit 1
timeout 3000 python pruning/main.py                choice=1 experiment_name=r2 source_exp_name=r2 $COMMON pruning_ratio=0.11 round_to=8 finetune_epochs=4 || exit 1
timeout 3000 python quantization/main.py           experiment_name=r2 model_type=pruned pruning_exp_name=r2 $COMMON || exit 1
python scripts/collect_summary.py r2 || exit 1
echo R5_R2_REGEN_DONE
