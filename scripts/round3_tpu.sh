#!/bin/bash
# Round-3 TPU work queue — everything blocked on the wedged axon tunnel,
# runnable in one shot when the chip returns. Each section is independent;
# a failure moves on to the next (logs carry the evidence either way).
#   1. fused whole-block MBConv A/B (VERDICT r2 ask 6 measurement)
#   2. W4A16 serving latency rows (family_bench now has a w4a16 column)
#   3. W4A16 accuracy on the real r2 / ef2 artifacts (stage-4 CLI, 5-fold)
#   4. ViT vt1 teacher + observer A/B (minmax/percentile/entropy)
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"
AB=output/quantization/ab
mkdir -p $AB logs

# ---- 1. fused MBConv A/B (REPORT roofline section needs this either way) --
timeout 2400 python scripts/fused_ab.py 2>&1 | tee logs/fused_ab.log

# ---- 2. family x method serving table incl. w4a16 ------------------------
timeout 2400 python scripts/family_bench.py 2>&1 | tee logs/family_bench_w4.log

# ---- 3. W4A16 accuracy, real artifacts (summary CSVs preserved first) ----
cp output/quantization/r2/quantization_summary.csv $AB/r2_full_menu.csv 2>/dev/null
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_full_menu.csv 2>/dev/null
timeout 2400 python quantization/main.py experiment_name=r2 model_type=pruned \
    pruning_exp_name=r2 $COMMON "methods=('weight_only_int4','weight_only_int8')" \
    2>&1 | tee logs/r2_w4.log
cp output/quantization/r2/quantization_summary.csv $AB/r2_w4a16.csv
timeout 3600 python quantization/main.py experiment_name=ef2 model_type=pruned \
    pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON \
    "methods=('weight_only_int4','weight_only_int8')" 2>&1 | tee logs/ef2_w4.log
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_w4a16.csv

# ---- 3b. AdaRound A/B on the EfficientNet static-int8 path ---------------
# PTQ-only accuracy rescue (no labels, calibration images only) next to the
# QAT number: ef2 static int8 with adaround_iters=300 vs the plain menu run.
timeout 2400 python quantization/main.py experiment_name=ef2 model_type=pruned \
    pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON \
    "methods=('static_int8',)" adaround_iters=300 2>&1 | tee logs/ef2_adaround.log
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_adaround.csv 2>/dev/null

# ---- 4. ViT vt1 teacher + observer A/B (second family for VERDICT ask 2) --
timeout 5400 python teacher_training/main.py choice=1 experiment_name=vt1 \
    model_name=vit_small_patch16_224 $COMMON epochs=8 learning_rate=3e-4 \
    2>&1 | tee logs/vt1_teacher.log
QVIT="experiment_name=vt1 model_type=teacher teacher_exp_name=vt1 teacher_model=vit_small_patch16_224 $COMMON"
for obs in minmax percentile entropy; do
    timeout 2400 python quantization/main.py $QVIT "methods=('static_int8',)" \
        observer=$obs 2>&1 | tee logs/vt1_$obs.log
    cp output/quantization/vt1/quantization_summary.csv $AB/vt1_$obs.csv
done
echo ROUND3_TPU_DONE
