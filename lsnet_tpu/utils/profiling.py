"""Profiling / timing utilities.

Replaces the reference `code/mmdet/utils/profiling.py` (torch.cuda.Event
timers) with JAX-native equivalents: ``profile_time`` context manager with
device synchronization, and ``trace`` wrapping ``jax.profiler`` for
TensorBoard-viewable TPU traces.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Optional


@contextlib.contextmanager
def profile_time(trace_name: str, name: str, enabled: bool = True,
                 stream=sys.stdout, end: str = "\n"):
    """Time a block, synchronizing outstanding device work first."""
    if not enabled:
        yield
        return
    import jax
    (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.monotonic()
    try:
        yield
    finally:
        (jax.device_put(0.0) + 0).block_until_ready()
        dt = time.monotonic() - t0
        print(f"{trace_name} {name} elapsed_time {dt * 1000:.2f} ms",
              file=stream, end=end)


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """data_time / step_time running stats (reference IterTimerHook)."""

    def __init__(self):
        self._last = time.monotonic()
        self.data_time = 0.0
        self.step_time = 0.0

    def mark_data(self):
        now = time.monotonic()
        self.data_time = now - self._last
        self._last = now

    def mark_step(self):
        now = time.monotonic()
        self.step_time = now - self._last
        self._last = now

    def metrics(self) -> dict:
        return {"data_time": self.data_time, "time": self.step_time}
