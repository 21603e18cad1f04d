"""Profiling / tracing subsystem.

The reference has no profiling support at all (SURVEY.md §5 — only dead
wall-clock prints in an unused autograd Function).  Here: a step timer with
summary statistics, and a jax.profiler trace window that captures device
traces viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax


class StepTimer:
    """Wall-clock step timing with percentile summaries."""

    def __init__(self, skip_first: int = 1):
        self.samples: list[float] = []
        self.skip_first = skip_first
        self._seen = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.skip_first:    # drop compile steps
            self.samples.append(dt)
        return False

    def summary(self) -> dict:
        if not self.samples:
            return {"steps": 0}
        s = sorted(self.samples)
        n = len(s)
        return {
            "steps": n,
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            "p90_s": s[min(n - 1, int(0.9 * n))],
            "max_s": s[-1],
        }

    def save(self, path: str) -> dict:
        out = self.summary()
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into log_dir (open with
    TensorBoard's profile plugin or Perfetto)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class TraceWindow:
    """Trace steps [start, stop) of a training loop.

    timer = TraceWindow(workdir + '/profile', start=5, stop=8)
    for step in ...:
        timer.tick(step)   # starts/stops the trace at the boundaries
    """

    def __init__(self, log_dir: str, start: int, stop: int):
        self.log_dir = log_dir
        self.start, self.stop = start, stop
        self._active = False

    def tick(self, step: int):
        if not self._active and step == self.start:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and step >= self.stop:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
