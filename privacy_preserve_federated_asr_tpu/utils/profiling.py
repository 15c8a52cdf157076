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


def enable_tpu_fast_rng() -> None:
    """Switch JAX's default PRNG to the hardware-backed RBG implementation.

    Threefry mask generation for the encoder's dropout layers costs
    ~55 ms/step on the flagship model (measured on v5e); RBG keeps full
    dropout semantics at ~zero cost (101 -> 155 utt/s). Call before any
    jitted computation.
    """
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")


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
