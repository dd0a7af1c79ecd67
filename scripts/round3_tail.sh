#!/bin/bash
# Round-3 tail queue (serialized: ONE TPU job at a time — timing runs must
# not share the chip). Run after the phase-2 queue + w4_policy_ab finish:
#   nohup bash scripts/round3_tail.sh > logs/round3_tail.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"

# 1. vt2 ViT pipeline tail: pruning crashed pre-fix (ViTSpec stem_width log
#    line, fixed in 4df4c57); KD artifacts are good — resume from pruning.
python pruning/main.py choice=1 experiment_name=vt2 source_exp_name=vt2 \
    model_name=vit_tiny_patch16_224 $COMMON pruning_ratio=0.1 round_to=8 \
    finetune_epochs=4 2>&1 | tee logs/vt2_prune.log
python quantization/main.py experiment_name=vt2 model_type=pruned \
    pruning_exp_name=vt2 student_model=vit_tiny_patch16_224 $COMMON \
    "methods=('static_int8','static_int8_bf16','dynamic_int8','fp16','weight_only_int8')" \
    2>&1 | tee logs/vt2_quant.log

# 1b. ef2 W4A16 rerun with the int8-fallback policy (naive int4-everything
#     measured -22 pts; policy keeps depthwise + tiny-reduction kernels int8).
#     Preserve the QAT'd final-menu CSV around the run.
AB=output/quantization/ab
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_final_menu.csv
timeout 3600 python quantization/main.py experiment_name=ef2 model_type=pruned \
    pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON \
    "methods=('weight_only_int4',)" 2>&1 | tee logs/ef2_w4_policy.log
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_w4a16_policy.csv
cp $AB/ef2_final_menu.csv output/quantization/ef2/quantization_summary.csv

# 2. Family x method serving table, fixed timing protocol (K-vs-2K chained
#    difference, median-of-5 scalar fetches).
timeout 3600 python scripts/family_bench.py 2>&1 | tee logs/family_bench_r3.log

# 3. Fused-MBConv A/B with the fixed protocol.
timeout 3600 python scripts/fused_ab.py 2>&1 | tee logs/fused_ab_r3.log

# 4. ViT bf16-carrier executor accuracy + speed on the vt1 artifacts.
timeout 3600 python scripts/vit_bf16_ab.py 2>&1 | tee logs/vit_bf16_ab.log

# 5. On-chip per-layer quantization sensitivity (ef2 fold 0).
python quantization/main.py experiment_name=ef2sens model_type=pruned \
    pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON "folds=(0,)" \
    "methods=()" sensitivity=True 2>&1 | tee logs/ef2_sensitivity.log

echo ROUND3_TAIL_DONE
