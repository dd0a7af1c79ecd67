from .observers import (
    ObserverState,
    minmax_qparams_affine,
    minmax_qparams_symmetric_per_channel,
)
from .engine import QuantizationEngine, quant_module
from .sensitivity import tap_sensitivity
from . import qeffnet, qmobilenet, qresnet, qvit, wo4, wo8

__all__ = [
    "ObserverState",
    "minmax_qparams_affine",
    "minmax_qparams_symmetric_per_channel",
    "QuantizationEngine",
    "quant_module",
    "tap_sensitivity",
    "qresnet",
    "qmobilenet",
    "qeffnet",
    "qvit",
    "wo4",
    "wo8",
]
