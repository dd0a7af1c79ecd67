from .observers import (
    ObserverState,
    minmax_qparams_affine,
    minmax_qparams_symmetric_per_channel,
)
from .engine import QuantizationEngine
from . import qresnet, qvit

__all__ = [
    "ObserverState",
    "minmax_qparams_affine",
    "minmax_qparams_symmetric_per_channel",
    "QuantizationEngine",
    "qresnet",
    "qvit",
]
