"""Profiling: jax.profiler traces + per-step wall timing.

The reference has no profiler integration — only verbose wall-clock prints
(ReIDNet.py:722-736, custom_optim_hook.py:28-39) and forced
CUDA_LAUNCH_BLOCKING (launcher_training.py:49-51). Here tracing is built in
(SURVEY.md §5.1 gap): wrap any region in trace_context() and open the dump in
TensorBoard/XProf; StepTimer gives blocking step timings when needed.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace around a region (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking per-step timer: call stop(result) with a device array to time
    through the async dispatch queue correctly."""

    def __init__(self):
        self.times = []
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def percentile(self, p: float) -> float:
        xs = sorted(self.times)
        if not xs:
            return 0.0
        return xs[min(int(len(xs) * p / 100), len(xs) - 1)]
