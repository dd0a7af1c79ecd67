from .config import (
    BaseConfig,
    TeacherConfig,
    KDConfig,
    PruningConfig,
    QuantConfig,
    CLS_NAME_ID_MAP,
)
from .prng import set_seed, key_for
from .log import get_logger
from . import artifacts

__all__ = [
    "BaseConfig",
    "TeacherConfig",
    "KDConfig",
    "PruningConfig",
    "QuantConfig",
    "CLS_NAME_ID_MAP",
    "set_seed",
    "key_for",
    "get_logger",
    "artifacts",
]
