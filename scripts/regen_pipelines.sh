#!/bin/bash
# Regenerate the reference-protocol artifact runs (REPORT.md): ResNet `r2`,
# EfficientNet `ef2`, and the ViT teacher `vt1`, plus the stage-4 calibration
# observer A/B (minmax-EMA vs percentile vs entropy) and the QAT run that
# closes the EfficientNet static-int8 accuracy gap. output/ is not committed,
# so these must be re-run each round before bench.py / REPORT tables can use
# real artifacts.
#
# Total: ~2-3h on the one chip. A/B CSVs land in output/quantization/ab/.
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"
AB=output/quantization/ab
mkdir -p $AB

# ---- ResNet r2 (bench.py headline artifact) ----
python teacher_training/main.py       choice=1 experiment_name=r2 $COMMON epochs=8 learning_rate=3e-4 || exit 1
python knowledge_distillation/main.py choice=1 experiment_name=r2 teacher_exp_name=r2 $COMMON epochs=8 learning_rate=3e-4 || exit 1
python pruning/main.py                choice=1 experiment_name=r2 source_exp_name=r2 $COMMON pruning_ratio=0.11 round_to=8 finetune_epochs=4 || exit 1
python quantization/main.py           experiment_name=r2 model_type=pruned pruning_exp_name=r2 $COMMON || exit 1

# ---- EfficientNet ef2 (reference-protocol B2->B0 pipeline) ----
python teacher_training/main.py       choice=1 experiment_name=ef2 model_name=efficientnet_b2 $COMMON epochs=8 learning_rate=3e-4 || exit 1
python knowledge_distillation/main.py choice=1 experiment_name=ef2 teacher_exp_name=ef2 teacher_model=efficientnet_b2 student_model=efficientnet_b0 $COMMON epochs=8 learning_rate=3e-4 || exit 1
python pruning/main.py                choice=1 experiment_name=ef2 source_exp_name=ef2 model_name=efficientnet_b0 $COMMON pruning_ratio=0.1 round_to=8 finetune_epochs=4 || exit 1

# Observer A/B on the ef2 pruned student: static int8 only (fast), one CSV
# per estimator, plus the QAT run (percentile ranges + 2 STE epochs).
QCOMMON="experiment_name=ef2 model_type=pruned pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON methods=('static_int8',)"
python quantization/main.py $QCOMMON observer=minmax     || exit 1
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_minmax.csv
python quantization/main.py $QCOMMON observer=percentile || exit 1
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_percentile.csv
python quantization/main.py $QCOMMON observer=entropy    || exit 1
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_entropy.csv
python quantization/main.py $QCOMMON observer=percentile qat_epochs=2 || exit 1
cp output/quantization/ef2/quantization_summary.csv $AB/ef2_percentile_qat2.csv

# Final ef2 artifacts: full method menu with the accuracy-first config so the
# deployed static-int8 artifact is the QAT one (REPORT ef2 table).
python quantization/main.py experiment_name=ef2 model_type=pruned pruning_exp_name=ef2 student_model=efficientnet_b0 $COMMON observer=percentile qat_epochs=2 || exit 1

# ---- ViT vt1: teacher-only pipeline for the observer A/B's second family ----
python teacher_training/main.py choice=1 experiment_name=vt1 model_name=vit_small_patch16_224 $COMMON epochs=8 learning_rate=3e-4 || exit 1
QVIT="experiment_name=vt1 model_type=teacher teacher_exp_name=vt1 teacher_model=vit_small_patch16_224 $COMMON methods=('static_int8',)"
python quantization/main.py $QVIT observer=minmax     || exit 1
cp output/quantization/vt1/quantization_summary.csv $AB/vt1_minmax.csv
python quantization/main.py $QVIT observer=percentile || exit 1
cp output/quantization/vt1/quantization_summary.csv $AB/vt1_percentile.csv
python quantization/main.py $QVIT observer=entropy    || exit 1
cp output/quantization/vt1/quantization_summary.csv $AB/vt1_entropy.csv
echo PIPELINES_DONE
