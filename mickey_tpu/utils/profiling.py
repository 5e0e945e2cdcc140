"""Profiling/observability hooks (no reference counterpart — SURVEY.md §5
notes the reference has none; the TPU build adds jax.profiler traces and
simple step timers)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with EMA; call .tick() once per step."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._last: Optional[float] = None
        self.step_time: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = dt if self.step_time is None else (
                self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now
        return self.step_time


class Timings:
    """Named scoped timers (host-side; device work must be blocked on)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}


def device_memory_stats() -> Dict[str, int]:
    """Per-device HBM usage (bytes), when the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = s.get("bytes_in_use", -1)
        except Exception:
            out[str(d)] = -1
    return out
