"""Tracing/profiling hooks (new capability per SURVEY §5 — the reference
has only wall-clock prints)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace around a block; view with TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock timing with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._count = 0
        self._total = 0.0
        self._last = None

    def __enter__(self):
        self._last = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._last
        self._count += 1
        if self._count > self.warmup:
            self._total += dt

    @property
    def mean_step_seconds(self):
        steps = max(self._count - self.warmup, 1)
        return self._total / steps
