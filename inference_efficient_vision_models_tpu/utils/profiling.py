"""Device tracing.

The reference's only profiling was wall-clock timers + thop hooks
(SURVEY.md §5). TPU-native observability is XLA device traces: wrap any
region in ``trace(dir)`` and inspect with TensorBoard/xprof; per-op device
times replace Python-side guessing.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler device trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
