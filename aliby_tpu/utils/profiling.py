"""Profiling hooks: jax.profiler traces + per-step wall-clock.

The reference's observability is a DEBUG ``@timer`` per step (``agora/
logging_timer.py``); here every engine run already accumulates per-step
wall-clock in ``state["timer"]`` (logged at the end of each position). For
device-level analysis wrap any region in :func:`trace` and open the
resulting TensorBoard profile (Perfetto) dump.
"""

from __future__ import annotations

import contextlib
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/aliby_tpu_trace"):
    """Capture an XLA/TPU profiler trace for the enclosed region."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield Path(log_dir)
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a trace (shows up on the timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
