from .engine import StructuredPruningEngine, prune_model
from .graph import group_slices
from .importance import channel_importance

__all__ = [
    "StructuredPruningEngine",
    "prune_model",
    "group_slices",
    "channel_importance",
]
