"""Profiling & debug hooks (SURVEY.md §5 — the reference has none; the
TPU build adds jax.profiler traces + per-step timing as the equivalent
of its param-count/wall-time logs, and jax_debug_nans as the analogue of
the dormant TRAIN.DETECT_ANOMALY flag)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging():
    """Fail fast on NaNs (debug mode; disables some fusions)."""
    jax.config.update("jax_debug_nans", True)


class StepTimer:
    """Wall-clock step timer with warmup skip; reports images/sec."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.count = 0
        self.elapsed = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_items: int = 1):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.elapsed += dt
            self._items = getattr(self, "_items", 0) + n_items

    def throughput(self) -> float:
        if self.elapsed == 0:
            return 0.0
        return getattr(self, "_items", 0) / self.elapsed
