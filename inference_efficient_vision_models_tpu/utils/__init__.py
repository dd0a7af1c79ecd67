from .device import device_materialize, cpu_device, tree_size_bytes

__all__ = ["device_materialize", "cpu_device", "tree_size_bytes"]
