"""Profiling helpers: jax.profiler traces + throughput counters
(SURVEY.md §5 'Tracing/profiling' — first-class seqs/sec/chip telemetry)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ishara_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Sliding seqs/sec counter. ``update(batch_size)`` per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events: list[tuple[float, int]] = []

    def update(self, n: int) -> float:
        now = time.perf_counter()
        self._events.append((now, n))
        if len(self._events) > self.window:
            self._events.pop(0)
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        total = sum(k for _, k in self._events[1:])
        return total / dt if dt > 0 else 0.0
