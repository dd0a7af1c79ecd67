#!/usr/bin/env python
"""Stage 1 entry point (reference CLI contract: `python teacher_training/main.py`).

Behavior is governed by TeacherConfig.choice (1=train, 2=test); optional
``key=value`` args override config fields, e.g.::

    python teacher_training/main.py choice=1 experiment_name=exp1 DEBUG_MODE=True
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inference_efficient_vision_models_tpu.cli.teacher import main

if __name__ == "__main__":
    main()
