"""Tracing / profiling utilities.

The reference has no profiling at all — only tqdm bars and wall-clock prints
(SURVEY.md §5.1). This module provides:
- ``trace_profile``: context manager around ``jax.profiler.trace`` writing a
  TensorBoard-compatible device trace,
- ``StepTimer``: step-time / images-per-second counters (the BASELINE.json
  north-star metric) with warmup skip and percentile summary.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace_profile(logdir: Optional[str]):
    """Profile the enclosed block with jax.profiler when logdir is set;
    no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    """Track per-step wall time and throughput."""

    def __init__(self, items_per_step: int, warmup: int = 2):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self._last: Optional[float] = None
        self._times: List[float] = []
        self._steps = 0

    def tick(self) -> Optional[float]:
        """Call once per step; returns the last step's duration (or None)."""
        now = time.perf_counter()
        duration = None
        if self._last is not None:
            duration = now - self._last
            self._steps += 1
            if self._steps > self.warmup:
                self._times.append(duration)
        self._last = now
        return duration

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def items_per_sec(self) -> float:
        return self.steps_per_sec * self.items_per_step

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        times = sorted(self._times)
        mid = times[len(times) // 2]
        return {
            "steps": len(self._times),
            "step_time_mean_s": sum(times) / len(times),
            "step_time_p50_s": mid,
            "step_time_max_s": times[-1],
            "steps_per_sec": self.steps_per_sec,
            "items_per_sec": self.items_per_sec,
        }
