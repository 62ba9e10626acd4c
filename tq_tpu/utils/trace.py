"""Profiling helpers (SURVEY.md §5 tracing row).

The reference's tracing story is thop forward hooks + wall-clock
AverageMeters.  On TPU the equivalents are (a) the pure shape-based op
counter (``tq_tpu.profilers``) and (b) ``jax.profiler`` device traces,
wrapped here with a directory convention so speed-of-light claims ship
with their traces.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax

__all__ = ["device_trace", "Timer"]


@contextlib.contextmanager
def device_trace(out_dir: str = "traces", label: str = "run"):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    path = Path(out_dir) / label
    path.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(path))
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Minimal wall-clock meter (the AverageMeter's closest TPU-side
    analogue; device time belongs to the profiler, not wall clock)."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self):
        return sum(self.times) / max(len(self.times), 1)

    @property
    def total(self):
        return sum(self.times)
