"""Profiling hooks (aux subsystem the reference lacks entirely; SURVEY §5).

``profile_trace`` wraps a region in a jax.profiler trace so kernels show up
in TensorBoard / xprof; per-step wall-clock timing lives in the trainer's
``steps_per_sec`` metric.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Context manager: traces the enclosed device work when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
