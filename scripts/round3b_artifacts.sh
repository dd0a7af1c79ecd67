#!/bin/bash
# Round-3 continuation artifact chain. Launch AFTER the r2 pipeline
# (logs/r2_regen.log prints R2_DONE):
#   nohup bash scripts/round3b_artifacts.sh > logs/round3b.log 2>&1 &
#
# Rebuilds the non-ResNet family artifacts (output/ is not committed) and
# runs the two NEW accuracy-contract closures this session adds:
#   * mb2 static_int8 + 2-epoch QAT   (was -1.5 vs fp32, outside the <=1pt budget)
#   * mb2 weight_only_int8 + 2-epoch QAT (was -1.3; W8-grid QAT is new code)
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"
AB=output/quantization/ab
mkdir -p $AB logs

# ---- EfficientNet ef2: B2 teacher -> B0 KD -> prune -> QAT'd menu ----
python teacher_training/main.py       choice=1 experiment_name=ef2 model_name=efficientnet_b2 $COMMON epochs=8 learning_rate=3e-4 || exit 1
python knowledge_distillation/main.py choice=1 experiment_name=ef2 teacher_exp_name=ef2 teacher_model=efficientnet_b2 student_model=efficientnet_b0 $COMMON epochs=8 learning_rate=3e-4 || exit 1
python pruning/main.py                choice=1 experiment_name=ef2 source_exp_name=ef2 model_name=efficientnet_b0 $COMMON pruning_ratio=0.1 round_to=8 finetune_epochs=4 || exit 1
# final menu with the accuracy pick (minmax observer + 2-epoch QAT, REPORT
# ef2 table) — with this session's change qat_epochs also QATs the W8 leaf
python quantization/main.py experiment_name=ef2 model_type=pruned pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON observer=minmax qat_epochs=2 || exit 1
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_menu_qat2.csv

# ---- MobileNetV2 mb2: r2 teacher -> KD -> prune -> menu + QAT closures ----
python knowledge_distillation/main.py choice=1 experiment_name=mb2 \
    teacher_exp_name=r2 teacher_model=resnet50 \
    student_model=mobilenet_v2 $COMMON epochs=8 learning_rate=3e-4 || exit 1
python pruning/main.py choice=1 experiment_name=mb2 source_exp_name=mb2 \
    model_name=mobilenet_v2 $COMMON pruning_ratio=0.1 round_to=8 \
    finetune_epochs=4 || exit 1
# PTQ-only menu first (the REPORT mb2 baseline row set)
python quantization/main.py experiment_name=mb2 model_type=pruned \
    pruning_exp_name=mb2 student_model=mobilenet_v2 $COMMON \
    "methods=('static_int8','dynamic_int8','fp16','weight_only_int8')" || exit 1
cp output/quantization/mb2/quantization_summary.csv $AB/mb2_menu.csv
# NEW: the QAT closures for the two out-of-budget mb2 rows
python quantization/main.py experiment_name=mb2q model_type=pruned \
    pruning_exp_name=mb2 student_model=mobilenet_v2 $COMMON \
    "methods=('static_int8','weight_only_int8')" qat_epochs=2 || exit 1
cp output/quantization/mb2q/quantization_summary.csv $AB/mb2_qat2.csv
# W4A16 + QAT (the REPORT headline mb2 artifact), final saved menu = PTQ one
python quantization/main.py experiment_name=mb2 model_type=pruned \
    pruning_exp_name=mb2 student_model=mobilenet_v2 $COMMON \
    "methods=('weight_only_int4',)" qat_epochs=4 || exit 1
cp output/quantization/mb2/quantization_summary.csv $AB/mb2_w4a16_qat.csv
cp $AB/mb2_menu.csv output/quantization/mb2/quantization_summary.csv

# ---- ViT: vt1 teacher -> vt2 tiny pipeline ----
python teacher_training/main.py choice=1 experiment_name=vt1 model_name=vit_small_patch16_224 $COMMON epochs=8 learning_rate=3e-4 || exit 1
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
echo ROUND3B_DONE
