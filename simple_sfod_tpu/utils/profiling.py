"""Profiling / tracing utilities (SURVEY §5: the reference only has
perf_counter data_time + detectron2's IterationTimer; the TPU-native
equivalent is jax.profiler device traces plus a step timer)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Median/mean step timing with warmup exclusion (the IterationTimer
    replacement). Call .start() before and .stop(result) after each step;
    stop() blocks on `result` so device async dispatch is accounted."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            # materializing read, not block_until_ready: the tunnel backend's
            # block_until_ready can return before execution finishes
            # (BENCH_NOTES round 2)
            jax.device_get(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {"mean_s": float("nan"), "median_s": float("nan"), "steps": 0}
        ts = sorted(self.times)
        return {
            "mean_s": sum(ts) / len(ts),
            "median_s": ts[len(ts) // 2],
            "steps": len(ts),
        }
