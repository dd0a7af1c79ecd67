#!/usr/bin/env python
"""Stage 3 entry point (reference CLI contract: `python pruning/main.py`).

Structured channel pruning of the stage-2 student with physical weight
re-packing + optional fine-tuning. ``key=value`` args override
PruningConfig, e.g.::

    python pruning/main.py choice=1 source_exp_name=exp1 pruning_ratio=0.05 finetune_epochs=2
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inference_efficient_vision_models_tpu.cli.prune import main

if __name__ == "__main__":
    main()
