"""Profiling / tracing hooks.

The reference has none (SURVEY §5: wall-clock prints only). TPU build:
``jax.profiler`` trace capture around arbitrary code regions plus a
simple per-step timer that blocks on device completion at meter points
(the ``torch.cuda.synchronize`` equivalent, trainers_ae.py:370).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ldmseg_trace"):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """On-demand profiling server (connect with TensorBoard)."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Wall-clock per-step timing with explicit device sync."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> dict:
        import numpy as np
        arr = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {"mean_s": float(arr.mean()), "p50_s": float(
            np.percentile(arr, 50)), "p90_s": float(np.percentile(arr, 90)),
            "steps": len(self.times)}
