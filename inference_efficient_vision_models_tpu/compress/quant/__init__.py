from .observers import (
    ObserverState,
    minmax_qparams_affine,
    minmax_qparams_symmetric_per_channel,
)
from .engine import QuantizationEngine, quant_module
from . import qmobilenet, qresnet, qvit

__all__ = [
    "ObserverState",
    "minmax_qparams_affine",
    "minmax_qparams_symmetric_per_channel",
    "QuantizationEngine",
    "quant_module",
    "qresnet",
    "qmobilenet",
    "qvit",
]
