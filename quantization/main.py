#!/usr/bin/env python
"""Stage 4 entry point (reference CLI contract: `python quantization/main.py`).

Post-training quantization of the teacher/student/pruned model: static INT8
(calibrated, true int8 MXU kernels), dynamic INT8 (dense layers), fp16/bf16
casts. ``key=value`` args override QuantConfig, e.g.::

    python quantization/main.py model_type=pruned pruning_exp_name=exp1
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inference_efficient_vision_models_tpu.cli.quantize import main

if __name__ == "__main__":
    main()
