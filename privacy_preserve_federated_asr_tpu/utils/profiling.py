"""Tracing / profiling utilities.

The reference has no profiler hooks (SURVEY.md §5 — only HF's
train_runtime summary rows); here profiling is built in:

  * ``trace_profile`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace directory,
  * ``StepProfiler`` — host-side per-step wall-clock histogram with
    percentile summary (catches stragglers/recompiles that averages hide).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace_profile(log_dir: str = "./saves/profile"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p90_ms": float(np.percentile(t, 90) * 1e3),
            "max_ms": float(t.max() * 1e3),
        }
