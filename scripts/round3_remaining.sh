#!/bin/bash
# Round-3 session continuation: the pieces of regen_pipelines.sh that have
# not run yet. r2/ef2 teacher+kd+prune artifacts already exist on disk
# (regenerated earlier today); this finishes stage-4 work:
#   1. r2 quantization full-menu re-run (summary CSV was truncated by a kill)
#   2. ef2 observer A/B (minmax / percentile / entropy, static-int8 only)
#   3. ef2 QAT A/B run + final full-menu QAT'd artifacts
#   4. vt1 ViT teacher + its observer A/B
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"
AB=output/quantization/ab
mkdir -p $AB

# ---- 1. r2 stage 4: full menu (bench.py headline artifact + REPORT table) ----
python quantization/main.py experiment_name=r2 model_type=pruned pruning_exp_name=r2 $COMMON || exit 1

# ---- 2. ef2 observer A/B (static int8 only; one CSV per estimator) ----
QCOMMON="experiment_name=ef2 model_type=pruned pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON methods=('static_int8',)"
python quantization/main.py $QCOMMON observer=minmax     || exit 1
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_minmax.csv
python quantization/main.py $QCOMMON observer=percentile || exit 1
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_percentile.csv
python quantization/main.py $QCOMMON observer=entropy    || exit 1
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_entropy.csv

# ---- 3. QAT A/B + final ef2 artifacts (accuracy-first config) ----
python quantization/main.py $QCOMMON observer=percentile qat_epochs=2 || exit 1
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_percentile_qat2.csv
python quantization/main.py experiment_name=ef2 model_type=pruned pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON observer=percentile qat_epochs=2 || exit 1

# ---- 4. ViT vt1 teacher + observer A/B (second family) ----
python teacher_training/main.py choice=1 experiment_name=vt1 model_name=vit_small_patch16_224 $COMMON epochs=8 learning_rate=3e-4 || exit 1
QVIT="experiment_name=vt1 model_type=teacher teacher_exp_name=vt1 teacher_model=vit_small_patch16_224 $COMMON methods=('static_int8',)"
python quantization/main.py $QVIT observer=minmax     || exit 1
cp output/quantization/vt1/quantization_summary.csv $AB/vt1_minmax.csv
python quantization/main.py $QVIT observer=percentile || exit 1
cp output/quantization/vt1/quantization_summary.csv $AB/vt1_percentile.csv
python quantization/main.py $QVIT observer=entropy    || exit 1
cp output/quantization/vt1/quantization_summary.csv $AB/vt1_entropy.csv
echo ROUND3_REMAINING_DONE
