from .device_profile import profile_device_ops, profile_hlo_ops
from .report import summarize_folds
from .profile import (
    count_params,
    model_size_bytes,
    flops_of,
    latency_ms,
    throughput_ips,
)

__all__ = [
    "profile_device_ops",
    "profile_hlo_ops",
    "summarize_folds",
    "count_params",
    "model_size_bytes",
    "flops_of",
    "latency_ms",
    "throughput_ips",
]
