"""Profiling / throughput instrumentation.

The reference has none (SURVEY §5.1 — only tqdm bars); the TPU build's
north-star metric (volumes/sec/chip) requires it. Provides:

- `StepTimer`: wall-clock step timing with warmup skip, p50/p90 stats,
  volumes/sec given a batch size;
- `trace`: context manager around `jax.profiler` writing a TensorBoard-
  loadable trace directory (`--profile` in the train CLI).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class StepTimer:
    warmup: int = 2
    _times: List[float] = field(default_factory=list)
    _skipped: int = 0
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        if self._skipped < self.warmup:
            self._skipped += 1
            return
        self._times.append(dt)

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def stats(self, items_per_step: int = 1) -> dict:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p90_ms": float(np.percentile(t, 90) * 1e3),
            "mean_ms": float(t.mean() * 1e3),
            "items_per_sec": float(items_per_step / np.percentile(t, 50)),
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace when log_dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
