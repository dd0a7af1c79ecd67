#!/bin/bash
# Round-3 tail phase 2 (serialized, launch AFTER round3_tail.sh prints
# ROUND3_TAIL_DONE): W4-QAT accuracy runs.
#   nohup bash scripts/round3_tail2.sh > logs/round3_tail2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"
AB=output/quantization/ab

# 1. ef2 W4A16 + W4-QAT, 5 folds: can training against the int4 grid rescue
#    the MBConv W4 mode (PTQ policy best: -8.5)? Own experiment dir so the
#    ef2 menu CSV stays intact.
python quantization/main.py experiment_name=ef2w4q model_type=pruned \
    pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON \
    "methods=('weight_only_int4',)" qat_epochs=4 \
    2>&1 | tee logs/ef2_w4_qat.log
cp output/quantization/ef2w4q/quantization_summary.csv $AB/ef2_w4a16_qat.csv

# 2. vt2 W4A16 accuracy (the ViT W4 datapoint; PTQ-only first).
cp output/quantization/vt2/quantization_summary.csv $AB/vt2_menu.csv
python quantization/main.py experiment_name=vt2 model_type=pruned \
    pruning_exp_name=vt2 student_model=vit_tiny_patch16_224 $COMMON \
    "methods=('weight_only_int4',)" 2>&1 | tee logs/vt2_w4.log
cp output/quantization/vt2/quantization_summary.csv $AB/vt2_w4a16.csv
cp $AB/vt2_menu.csv output/quantization/vt2/quantization_summary.csv

echo ROUND3_TAIL2_DONE
