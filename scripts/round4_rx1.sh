#!/bin/bash
# Round-4 fifth-family pipeline (VERDICT r3 item 6): ResNeXt through all four
# stages — resnext50_32x4d teacher → resnext26_32x4d distilled student →
# structured pruning (grouped-conv lane groups) → PTQ. Fold 0, reference
# protocol on the standard synthetic surrogate.
# Results: output/<stage>/rx1/; quantization_summary.csv is the family table.
set -x
cd "$(dirname "$0")/.."
RX="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False folds=0"

timeout 3000 python teacher_training/main.py choice=1 experiment_name=rx1 model_name=resnext50_32x4d $RX epochs=8 learning_rate=3e-4 || exit 1
timeout 3000 python knowledge_distillation/main.py choice=1 experiment_name=rx1 teacher_exp_name=rx1 teacher_model=resnext50_32x4d student_model=resnext26_32x4d $RX epochs=8 learning_rate=3e-4 || exit 1
timeout 3000 python pruning/main.py choice=1 experiment_name=rx1 source_exp_name=rx1 model_name=resnext26_32x4d $RX pruning_ratio=0.11 round_to=8 finetune_epochs=4 || exit 1
timeout 3000 python quantization/main.py experiment_name=rx1 model_type=pruned pruning_exp_name=rx1 student_model=resnext26_32x4d $RX || exit 1
echo RX1_PIPELINE_DONE
