#!/usr/bin/env python
"""Stage 2 entry point (reference CLI contract: `python knowledge_distillation/main.py`).

Distills the stage-1 teacher into the student with the (1-α)·CE + α·KL·T²
loss. ``key=value`` args override KDConfig fields, e.g.::

    python knowledge_distillation/main.py choice=1 teacher_exp_name=exp1
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inference_efficient_vision_models_tpu.cli.kd import main

if __name__ == "__main__":
    main()
