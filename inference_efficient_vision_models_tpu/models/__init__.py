from . import resnet
from .widths import ResNetSpec, resnet_spec, residual_groups
from .registry import create_model, make_spec

__all__ = [
    "resnet",
    "ResNetSpec",
    "resnet_spec",
    "residual_groups",
    "create_model",
    "make_spec",
]
