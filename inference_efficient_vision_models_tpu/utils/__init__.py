from .device import (
    device_materialize,
    cpu_device,
    tree_size_bytes,
    enable_compilation_cache,
)

__all__ = [
    "device_materialize",
    "cpu_device",
    "tree_size_bytes",
    "enable_compilation_cache",
]
