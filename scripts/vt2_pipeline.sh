#!/bin/bash
# ViT through the FULL 4-stage reference protocol (experiment `vt2`):
# reuses the `vt1` ViT-S teacher (trained by regen_pipelines.sh), then
# KD into ViT-Tiny -> head+MLP structured pruning -> the quantization menu.
# Completes the "all four families through the full pipeline" evidence with
# a real on-chip run (the others are r2 / ef2 / mb2 — scripts/mb2_pipeline.sh).
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"

python knowledge_distillation/main.py choice=1 experiment_name=vt2 \
    teacher_exp_name=vt1 teacher_model=vit_small_patch16_224 \
    student_model=vit_tiny_patch16_224 $COMMON epochs=8 learning_rate=3e-4 || exit 1
python pruning/main.py choice=1 experiment_name=vt2 source_exp_name=vt2 \
    model_name=vit_tiny_patch16_224 $COMMON pruning_ratio=0.1 round_to=8 \
    finetune_epochs=4 || exit 1
python quantization/main.py experiment_name=vt2 model_type=pruned \
    pruning_exp_name=vt2 student_model=vit_tiny_patch16_224 $COMMON \
    "methods=('static_int8','static_int8_bf16','dynamic_int8','fp16','weight_only_int8')" \
    || exit 1
echo VT2_DONE
