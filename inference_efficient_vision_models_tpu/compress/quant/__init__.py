from .observers import (
    ObserverState,
    minmax_qparams_affine,
    minmax_qparams_symmetric_per_channel,
)
from .automix import auto_mixed_policy
from .engine import QuantizationEngine, quant_module
from .sensitivity import make_switch_forward, tap_sensitivity
from . import qeffnet, qmobilenet, qresnet, qvit, wo4, wo8

__all__ = [
    "ObserverState",
    "minmax_qparams_affine",
    "minmax_qparams_symmetric_per_channel",
    "QuantizationEngine",
    "quant_module",
    "tap_sensitivity",
    "make_switch_forward",
    "auto_mixed_policy",
    "qresnet",
    "qmobilenet",
    "qeffnet",
    "qvit",
    "wo4",
    "wo8",
]
