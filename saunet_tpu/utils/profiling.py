"""Tracing / profiling utilities (SURVEY.md §5: the reference has only
wall-clock AverageMeters; the rebuild makes device profiling first-class).

  trace(dir):       context manager around jax.profiler.trace — produces a
                    TensorBoard-loadable device trace.
  annotate(name):   named TraceAnnotation region (shows up in the trace).
  StepTimer:        wall-clock per-step timing with compile-step exclusion
                    and percentile summaries — the slices/sec/chip metric
                    used by bench.py.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing; `skip` initial steps excluded (compile)."""

    def __init__(self, skip: int = 1):
        self.skip = skip
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip:
            self.times.append(dt)
        return False

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "items_per_sec": float(items_per_step / t.mean()),
        }
