#!/bin/bash
# SP-KD A/B on the weakest KD family (MobileNetV2, cross-family from the r2
# ResNet50 teacher; plain-KD 5-fold mean ~87.9 with weak folds 1/2/4).
# Launch AFTER round3b_artifacts.sh (needs r2 teacher + fresh plain mb2 KD
# baseline): pilot gamma on the two weak folds, then full 5-fold at the
# winner. Results in output/knowledge_distillation/<exp>/kd_results.csv.
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"
KD="choice=1 teacher_exp_name=r2 teacher_model=resnet50 student_model=mobilenet_v2 $COMMON epochs=8 learning_rate=3e-4"

python knowledge_distillation/main.py experiment_name=mb2sp_g300 $KD sp_weight=300 "folds=(1,2)" || exit 1
python knowledge_distillation/main.py experiment_name=mb2sp_g3000 $KD sp_weight=3000 "folds=(1,2)" || exit 1
echo "--- pilot CSVs ---"
cat output/knowledge_distillation/mb2sp_g300/kd_results.csv
cat output/knowledge_distillation/mb2sp_g3000/kd_results.csv
echo ROUND3C_PILOT_DONE
