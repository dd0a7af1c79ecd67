#!/bin/bash
# Resume point after the 09:59 interruption: regen_pipelines.sh completed
# r2 + ef2 (incl. observer A/B, QAT, final menu) and the vt1 teacher; the
# vt1 minmax quantization died at fold 4. Re-run the three vt1 observer A/B
# passes, then hand off to the phase-2 measurement queue.
set -x
cd "$(dirname "$0")/.."
COMMON="num_folds=5 synthetic_size=600 batch_size=32 pretrained=False"
AB=output/quantization/ab
mkdir -p $AB logs

QVIT="experiment_name=vt1 model_type=teacher teacher_exp_name=vt1 teacher_model=vit_small_patch16_224 $COMMON methods=('static_int8',)"
timeout 3600 python quantization/main.py $QVIT observer=minmax \
    && cp output/quantization/vt1/quantization_summary.csv $AB/vt1_minmax.csv
timeout 3600 python quantization/main.py $QVIT observer=percentile \
    && cp output/quantization/vt1/quantization_summary.csv $AB/vt1_percentile.csv
timeout 3600 python quantization/main.py $QVIT observer=entropy \
    && cp output/quantization/vt1/quantization_summary.csv $AB/vt1_entropy.csv
echo PIPELINES_DONE

bash scripts/round3_phase2.sh
