"""Profiling & tracing (SURVEY.md §5: the reference has only MetricLogger
timing prints, reference utils/__init__.py:211-254; we add proper tooling).

- `trace(logdir)` — jax.profiler trace context for a window of steps
  (view in TensorBoard / xprof).
- `start_server(port)` — on-demand profiling endpoint.
- `StepTimer` — host-side per-step wall timing with device-sync points and
  derived samples/sec + MFU given a FLOPs estimate.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with a forced host sync per window; computes
    samples/sec and MFU from a per-step FLOPs estimate."""

    def __init__(self, flops_per_step: Optional[float] = None,
                 peak_flops: Optional[float] = None, window: int = 20):
        self.flops = flops_per_step
        self.peak = peak_flops
        self.window = window
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        """Pass a device scalar to force completion (tunnel-safe)."""
        if sync_value is not None:
            float(sync_value)
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self.times = self.times[-self.window:]
            self._t0 = None

    @property
    def mean_step_s(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    def stats(self, batch_size: int) -> dict:
        dt = self.mean_step_s
        out = {"step_time_s": dt,
               "samples_per_sec": batch_size / dt if dt else 0.0}
        if self.flops and self.peak and dt:
            out["mfu"] = self.flops / dt / self.peak
        return out
