"""Profiling / tracing utilities.

TPU-native replacement for the reference's wall-time ``profile_kv`` contexts
(scripts/diffusion/logger.py:294-312): ``device_trace`` captures a real
``jax.profiler`` trace (viewable in TensorBoard / xprof), ``StepTimer``
feeds per-step throughput counters (steps/s, clips/s) into the KV logger the
way the reference logs grad/param norms per step (fp16_util.py:219-226).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Optional

__all__ = ["device_trace", "StepTimer", "annotate"]


@contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Throughput counters with warmup exclusion.

    >>> timer = StepTimer(batch_size=512)
    >>> for batch in data:
    ...     train_step(...)
    ...     stats = timer.tick()   # {'steps_per_sec', 'clips_per_sec', ...}
    """

    def __init__(self, batch_size: int, warmup_steps: int = 2):
        self.batch_size = batch_size
        self.warmup_steps = warmup_steps
        self._count = 0
        self._t0: Optional[float] = None
        self._last = None

    def tick(self) -> dict:
        now = time.perf_counter()
        self._count += 1
        out = {}
        if self._last is not None:
            dt = now - self._last
            out["step_time_s"] = dt
            out["steps_per_sec"] = 1.0 / max(dt, 1e-9)
            out["clips_per_sec"] = self.batch_size / max(dt, 1e-9)
        self._last = now
        if self._count == self.warmup_steps:
            self._t0 = now
            self._steady_start_count = self._count
        if self._t0 is not None and self._count > self.warmup_steps:
            steady = self._count - self._steady_start_count
            out["avg_steps_per_sec"] = steady / max(now - self._t0, 1e-9)
            out["avg_clips_per_sec"] = out["avg_steps_per_sec"] * self.batch_size
        return out
