#!/bin/bash
# Round-4 hard-surrogate A/Bs, part 2 (VERDICT r3 item 2): after round4_h1.sh.
#  1. cross-family students on the hard task: EfficientNet-B0 (for the
#     observer + QAT-vs-AdaRound A/Bs) and MobileNetV2 (SP-KD A/B), both
#     distilled from the h1 ResNet50 teacher, folds 0-1,
#  2. SP-KD A/B: sp_weight=0 vs 3000 (r3 winner) on the MBv2 student,
#  3. observer A/B: static-int8 accuracy under minmax/percentile/entropy
#     range estimators on the EfficientNet student,
#  4. QAT vs AdaRound on the same student/method.
# Results land in output/{knowledge_distillation,quantization}/h1*/.
set -x
cd "$(dirname "$0")/.."
H="num_folds=5 num_classes=12 synthetic_variant=hard synthetic_size=600 batch_size=32 pretrained=False"
KD="choice=1 teacher_exp_name=h1 teacher_model=resnet50 $H \"folds=(0,1)\" epochs=20 learning_rate=3e-4"

run_kd () { # exp student extra...
  timeout 3000 python knowledge_distillation/main.py choice=1 experiment_name=$1 \
    teacher_exp_name=h1 teacher_model=resnet50 student_model=$2 $H "folds=(0,1)" \
    epochs=20 learning_rate=3e-4 "${@:3}" || exit 1
}

run_kd h1e efficientnet_b0
run_kd h1m mobilenet_v2
run_kd h1msp mobilenet_v2 sp_weight=3000
echo H1B_KD_DONE

for OBS in minmax percentile entropy; do
  timeout 3000 python quantization/main.py experiment_name=h1e_$OBS model_type=student \
    student_exp_name=h1e student_model=efficientnet_b0 observer=$OBS \
    "methods=('static_int8',)" $H "folds=(0,1)" || exit 1
done
echo H1B_OBS_DONE

timeout 3000 python quantization/main.py experiment_name=h1e_qat model_type=student \
  student_exp_name=h1e student_model=efficientnet_b0 qat_epochs=2 \
  "methods=('static_int8',)" $H "folds=(0,1)" || exit 1
timeout 3000 python quantization/main.py experiment_name=h1e_ada model_type=student \
  student_exp_name=h1e student_model=efficientnet_b0 adaround_iters=600 \
  "methods=('static_int8',)" $H "folds=(0,1)" || exit 1
echo H1B_DONE
