#!/bin/bash
# MobileNetV2 through the FULL 4-stage reference protocol (experiment `mb2`):
# reuses the `r2` ResNet50 teacher (cross-family KD, the reference's own
# teacher choice), then KD into MobileNetV2 -> SE/residual-coupled
# structured pruning -> the quantization menu incl. W4A16 with the
# int8-fallback policy + W4-targeted QAT (the MBConv recipe from ef2).
# Completes the "all four families through the full pipeline" evidence
# (the others are r2 / ef2 / vt2).
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"

python knowledge_distillation/main.py choice=1 experiment_name=mb2 \
    teacher_exp_name=r2 teacher_model=resnet50 \
    student_model=mobilenet_v2 $COMMON epochs=8 learning_rate=3e-4 || exit 1
python pruning/main.py choice=1 experiment_name=mb2 source_exp_name=mb2 \
    model_name=mobilenet_v2 $COMMON pruning_ratio=0.1 round_to=8 \
    finetune_epochs=4 || exit 1
python quantization/main.py experiment_name=mb2 model_type=pruned \
    pruning_exp_name=mb2 student_model=mobilenet_v2 $COMMON \
    "methods=('static_int8','dynamic_int8','fp16','weight_only_int8')" \
    || exit 1
cp output/quantization/mb2/quantization_summary.csv \
   output/quantization/ab/mb2_menu.csv 2>/dev/null
# W4A16 with the MBConv recipe: int8-fallback policy + QAT against the
# int4 group grid (ef2 showed naive RTN collapses on MBConv; policy+QAT
# recovers to ~fp32).
python quantization/main.py experiment_name=mb2 model_type=pruned \
    pruning_exp_name=mb2 student_model=mobilenet_v2 $COMMON \
    "methods=('weight_only_int4',)" qat_epochs=4 || exit 1
cp output/quantization/mb2/quantization_summary.csv \
   output/quantization/ab/mb2_w4a16_qat.csv 2>/dev/null
cp output/quantization/ab/mb2_menu.csv \
   output/quantization/mb2/quantization_summary.csv 2>/dev/null
echo MB2_DONE
