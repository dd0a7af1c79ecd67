#!/bin/bash
# Round-5 MBConv hard-surrogate unblock (VERDICT r4 task 6): round 4 found
# from-scratch EfficientNet-B0 / MobileNetV2 students collapse under the
# hard surrogate's train→test illumination shift (B0 40% val → 6.8% test;
# MBv2 11.0%), which blocked the observer/QAT A/Bs for exactly the families
# whose quantization is accuracy-fragile. Fix: train-time augmentation
# (data/augment.py) — label-safe ops only for the orientation classes
# (NO flips; 180° rotation, crop, brightness/contrast, and the targeted
# planar illumination-gradient jitter that spans the shifted test range).
#
# Phase 1 (this script, part A): B0 + MBv2 students WITH augmentation
#   (h5e / h5m), same teacher (h1), same folds (0,1), same 20 epochs as the
#   round-4 no-aug controls (h1e / h1m) — single-variable A/B.
# Phase 2 (part B, run after A passes the >70% gate): the B0 static-int8
#   observer/QAT A/B on the generalizing student (h5e_minmax / h5e_entropy /
#   h5e_qat) — the h-task quantization table REPORT's ResNet table has.
set -x
cd "$(dirname "$0")/.."
H="num_folds=5 num_classes=12 synthetic_variant=hard synthetic_size=600 batch_size=32 pretrained=False"
AUG="augment=True augment_flip=False augment_rot180=True augment_illum_gradient=0.5 augment_noise=0.15"
EP="${EPOCHS:-60}"

PART="${1:-a}"

if [ "$PART" = "a" ]; then
  # 20-epoch v1 (illum 0.35, no noise aug) measured B0 31.3/29.3% test —
  # 4.5x the no-aug control but underfit (fold-0 val still climbing) and
  # noise-shift-exposed; v2 = 60 epochs + noise jitter + wider illum.
  for M in efficientnet_b0:h5e mobilenet_v2:h5m; do
    STUDENT="${M%%:*}"; EXP="${M##*:}"
    timeout 3000 python knowledge_distillation/main.py choice=1 experiment_name=$EXP \
      teacher_exp_name=h1 teacher_model=resnet50 student_model=$STUDENT \
      $H $AUG "folds=(0,1)" epochs=$EP learning_rate=3e-4 || exit 1
  done
  echo R5_MBCONV_A_DONE
fi

if [ "$PART" = "b" ]; then
  for OBS in minmax entropy; do
    timeout 3000 python quantization/main.py experiment_name=h5e_$OBS model_type=student \
      student_exp_name=h5e student_model=efficientnet_b0 observer=$OBS \
      "methods=('static_int8','weight_only_int8')" $H "folds=(0,1)" || exit 1
  done
  timeout 3000 python quantization/main.py experiment_name=h5e_qat model_type=student \
    student_exp_name=h5e student_model=efficientnet_b0 qat_epochs=2 \
    "methods=('static_int8','weight_only_int8')" $H "folds=(0,1)" || exit 1
  echo R5_MBCONV_B_DONE
fi
