"""Named per-rank phase timers.

Reference: host/timer/timer.{h,cc} — nanosecond start/stop per rank id,
summed across ranks, exposed as benchmark counters normalized by rank count
(host/join/join_benchmark.cc:48-60).

Backed by the native C++ timer registry (native/runtime.cpp) when the
toolchain is available, with a pure-Python fallback. Device-side phase cost
attribution uses jax.profiler annotations instead of DPU cycle counters
(SURVEY §5.1); see bench/harness.py.
"""

from __future__ import annotations

import time
from typing import Dict


class _PyTimers:
    def __init__(self):
        self._acc: Dict[str, Dict[int, int]] = {}
        self._open: Dict[tuple, int] = {}

    def start(self, name: str, rank: int = 0):
        self._open[(name, rank)] = time.monotonic_ns()

    def stop(self, name: str, rank: int = 0):
        t0 = self._open.pop((name, rank), None)
        if t0 is None:
            return
        self._acc.setdefault(name, {}).setdefault(rank, 0)
        self._acc[name][rank] += time.monotonic_ns() - t0

    def sum_ns(self, name: str) -> int:
        return sum(self._acc.get(name, {}).values())

    def sum_ms(self, name: str) -> float:
        return self.sum_ns(name) / 1e6

    def rank_count(self, name: str) -> int:
        return len(self._acc.get(name, {}))


def Timers():
    """Create a timer registry (native if possible)."""
    from . import native

    if native.available():
        return native.NativeTimers()
    return _PyTimers()


class timed:
    """Context manager: with timed(timers, "phase", rank): ..."""

    def __init__(self, timers, name: str, rank: int = 0):
        self.t, self.name, self.rank = timers, name, rank

    def __enter__(self):
        if self.t is not None:
            self.t.start(self.name, self.rank)
        return self

    def __exit__(self, *exc):
        if self.t is not None:
            self.t.stop(self.name, self.rank)
        return False
