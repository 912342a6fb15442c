"""Timing harness for device benchmarks.

Reference: Google Benchmark registrations in host/*/\\*_benchmark.cc with
bytes/items processed counters and per-phase timers normalized by rank count
(join_benchmark.cc:48-60). Here: warmup + timed iterations around jitted
calls with block_until_ready as the iteration barrier (the dpu_sync analog).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Dict

import jax


@dataclasses.dataclass
class BenchResult:
    name: str
    real_ms: float  # per-iteration wall ms
    items_per_s: float
    bytes_per_s: float
    iterations: int
    counters: Dict[str, float]

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "real_ms": self.real_ms,
                "items_per_s": self.items_per_s,
                "bytes_per_s": self.bytes_per_s,
                "iterations": self.iterations,
                **self.counters,
            }
        )


def time_fn(fn: Callable, warmup: int = 2, iters: int = 5) -> float:
    """Median-of-iters wall time of fn() in seconds; fn must block until its
    device work is done (return arrays are synced here)."""
    for _ in range(warmup):
        out = fn()
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def run_benchmark(
    name: str,
    fn: Callable,
    items: int,
    bytes_per_item: int = 4,
    warmup: int = 2,
    iters: int = 5,
    counters: Dict[str, float] | None = None,
) -> BenchResult:
    sec = time_fn(fn, warmup, iters)
    return BenchResult(
        name=name,
        real_ms=sec * 1e3,
        items_per_s=items / sec,
        bytes_per_s=items * bytes_per_item / sec,
        iterations=iters,
        counters=counters or {},
    )
