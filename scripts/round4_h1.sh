#!/bin/bash
# Round-4 discriminative-surrogate protocol (VERDICT r3 items 2+3): train a
# teacher + distilled student on the HARD synthetic task (12 fine-grained
# orientation×frequency classes, train→test shift, 5% label noise), folds
# 0–1, then A/B the pruning criteria at stress ratio 0.30.
# Results: output/{teacher_training,knowledge_distillation}/h1/,
#          criteria table on stdout (tee'd to logs/r4_h1_criteria.log).
set -x
cd "$(dirname "$0")/.."
H="num_folds=5 num_classes=12 synthetic_variant=hard synthetic_size=600 batch_size=32 pretrained=False"

timeout 3000 python teacher_training/main.py choice=1 experiment_name=h1 $H "folds=(0,1)" epochs=20 learning_rate=3e-4 || exit 1
timeout 3000 python knowledge_distillation/main.py choice=1 experiment_name=h1 teacher_exp_name=h1 $H "folds=(0,1)" epochs=20 learning_rate=3e-4 || exit 1
echo H1_PIPELINE_DONE
for FOLD in 0 1; do
  timeout 3000 python scripts/prune_criteria_ab.py 0.30 1 $FOLD source_exp_name=h1 \
    num_classes=12 synthetic_variant=hard synthetic_size=600 batch_size=32 \
    | tee logs/r4_h1_criteria_f$FOLD.log || exit 1
done
echo H1_CRITERIA_DONE
