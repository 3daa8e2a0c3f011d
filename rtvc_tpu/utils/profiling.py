"""Profiling hooks: step timers + jax.profiler traces.

The reference had zero performance instrumentation (SURVEY.md §5). Here
timing is first-class: ``StepTimer`` tracks per-step wall time with correct
device synchronization (block_until_ready on a representative output), and
``profile_trace`` wraps a region in a jax.profiler trace viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax
import numpy as np


class StepTimer:
    def __init__(self, name: str = "step"):
        self.name = name
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        self.durations.append(dt)
        return dt

    @contextlib.contextmanager
    def measure(self, sync_on_result=None) -> Iterator[None]:
        self.start()
        yield
        self.stop(sync_on_result)

    def summary(self, skip_warmup: int = 1) -> dict:
        d = np.asarray(self.durations[skip_warmup:] or self.durations)
        return {
            f"{self.name}_mean_s": float(d.mean()),
            f"{self.name}_p50_s": float(np.percentile(d, 50)),
            f"{self.name}_p90_s": float(np.percentile(d, 90)),
            f"{self.name}_min_s": float(d.min()),
        }


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace region (open with TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
