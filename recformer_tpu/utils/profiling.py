"""Profiling + observability hooks.

The reference has no tracing/profiling at all (SURVEY §5.1 — tqdm bars only).
Here: ``jax.profiler`` trace capture around a step range, and a host-side step
timer with throughput accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a TensorBoard-viewable device trace when ``log_dir`` is set;
    no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with EMA and examples/s accounting."""

    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._avg = None
        self._last = None
        self._count = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._avg = dt if self._avg is None else self._ema * self._avg + (1 - self._ema) * dt
            self._count += 1
        self._last = now

    @property
    def avg_step_seconds(self) -> Optional[float]:
        return self._avg

    def throughput(self, batch_size: int) -> Optional[float]:
        if not self._avg:
            return None
        return batch_size / self._avg

    def summary(self, batch_size: int) -> Dict[str, float]:
        return {
            "avg_step_ms": (self._avg or 0.0) * 1e3,
            "examples_per_sec": self.throughput(batch_size) or 0.0,
            "steps_timed": self._count,
        }
