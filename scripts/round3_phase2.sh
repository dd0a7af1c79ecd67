#!/bin/bash
# Round-3 phase 2 — runs after regen_pipelines.sh completes (artifacts for
# r2 / ef2 / vt1 on disk). Everything here is measurement + the remaining
# accuracy runs; each section independent, failures move on.
#   1. fused whole-block MBConv A/B (VERDICT r2 ask 6 measurement)
#   2. family x method serving table (now incl. w4a16, mixed, ViT 4th family)
#   3. W4A16 accuracy on the real r2 / ef2 artifacts
#   4. AdaRound A/B on the ef2 static-int8 path (PTQ-only rescue next to QAT)
#   5. ViT full 4-stage pipeline (vt2; reuses the vt1 teacher)
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"
AB=output/quantization/ab
mkdir -p $AB logs

# ---- 0. host s2d preprocess microbench (idle host) ----------------------
timeout 300 python scripts/host_s2d_bench.py 2>&1 | tee logs/host_s2d.log

# ---- 1. fused MBConv A/B ------------------------------------------------
timeout 2400 python scripts/fused_ab.py 2>&1 | tee logs/fused_ab.log

# ---- 2. family x method serving table -----------------------------------
timeout 3600 python scripts/family_bench.py 2>&1 | tee logs/family_bench_w4.log

# ---- 3. W4A16 accuracy, real artifacts (menu CSVs preserved first) ------
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

# ---- 4. AdaRound A/B, ef2 static int8 -----------------------------------
# own experiment dir (ef2ar) so it can't clobber ef2's final QAT'd
# static-int8 artifact; it still reads ef2's pruned checkpoints.
timeout 2400 python quantization/main.py experiment_name=ef2ar model_type=pruned \
    pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON \
    "methods=('static_int8',)" adaround_iters=300 2>&1 | tee logs/ef2_adaround.log
cp output/quantization/ef2ar/quantization_summary.csv $AB/ef2_adaround.csv 2>/dev/null

# ---- 4b. minmax + QAT (round-2's accuracy pick) + final ef2 artifacts ----
QE="experiment_name=ef2 model_type=pruned pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON"
timeout 2400 python quantization/main.py $QE "methods=('static_int8',)" \
    observer=minmax qat_epochs=2 2>&1 | tee logs/ef2_minmax_qat.log
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_minmax_qat2.csv 2>/dev/null
# final ef2 menu with the accuracy-first config -> canonical CSV + artifacts
timeout 3600 python quantization/main.py $QE observer=minmax qat_epochs=2 \
    2>&1 | tee logs/ef2_final_menu.log

# ---- 5. ViT full pipeline (vt2) -----------------------------------------
bash scripts/vt2_pipeline.sh 2>&1 | tee logs/vt2.log

# restore the r2 full-menu CSV as the canonical summary (W4 run overwrote it)
cp $AB/r2_full_menu.csv output/quantization/r2/quantization_summary.csv 2>/dev/null
echo ROUND3_PHASE2_DONE
