"""Observability: benchmark counters, device profiling, operator logging.

Reference (SURVEY §5.1, §5.5):
  * device cycle counters (perfcounter_config + nb_cycles readback,
    dpu/filter/main.c:38-49, host/dpuext/perf.cc) -> jax.profiler device
    traces (trace()/annotate() below) — XLA reports per-op device time in
    the trace instead of a raw cycle count.
  * Google Benchmark counters (bytes/items processed, per-phase ms
    normalized by rank count, join_benchmark.cc:48-60) -> Counters registry,
    emitted as JSON lines (scripts/parse_results.py -> CSV).
  * ENABLE_LOG/ENABLE_TRACE printf logging (shared/umq/log.h) -> log()/
    trace() gated on config.FLAGS.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Dict

from .config import FLAGS


def log(msg: str) -> None:
    """Operator-level logging (reference log(), shared/umq/log.h:6-11)."""
    if FLAGS.enable_log:
        print(f"[dpu_olap_tpu] {msg}", file=sys.stderr, flush=True)


def device_log(tag: str, per_device_values, names=None) -> None:
    """Per-device log streaming (DpuSet::log / exec_with_log analog,
    host/dpuext/dpuext.hpp:751-778): the reference drains each DPU's printf
    buffer after a launch; here operators gather small per-shard diagnostic
    arrays (counts, offsets, retry flags) and stream them one line per
    device, gated on ENABLE_LOG like the reference's ENABLE_LOG=1 builds.

    per_device_values: array-like of shape (n_devices, ...) — anything
    np.asarray accepts. names: optional per-column labels.
    """
    if not FLAGS.enable_log:
        return
    import numpy as np

    vals = np.asarray(per_device_values)
    if vals.ndim == 1:
        vals = vals[:, None]
    vals = vals.reshape(vals.shape[0], -1)
    for dev in range(vals.shape[0]):
        row = vals[dev]
        if names:
            body = " ".join(f"{n}={v}" for n, v in zip(names, row))
        else:
            body = " ".join(str(v) for v in row)
        print(f"[dev {dev}] {tag}: {body}", file=sys.stderr, flush=True)


@contextlib.contextmanager
def trace(name: str, trace_dir: str | None = None):
    """Device profiling scope (the perfcounter analog). With trace_dir set,
    captures a jax.profiler trace viewable in TensorBoard/Perfetto; always
    annotates the region so device ops attribute to the phase name."""
    import jax

    if trace_dir and FLAGS.enable_perf:
        with jax.profiler.trace(trace_dir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield


class Counters:
    """Benchmark counter registry -> one JSON object (Google Benchmark
    counter emission analog)."""

    def __init__(self, name: str):
        self.name = name
        self.values: Dict[str, float] = {}
        self._t0 = time.perf_counter()

    def set(self, key: str, value: float) -> "Counters":
        self.values[key] = float(value)
        return self

    def rate(self, key: str, items: int, seconds: float) -> "Counters":
        self.values[key] = items / seconds
        return self

    def items_processed(self, n: int, seconds: float, bytes_per_item: int = 4):
        self.values["items_per_s"] = n / seconds
        self.values["bytes_per_s"] = n * bytes_per_item / seconds
        self.values["real_ms"] = seconds * 1e3
        return self

    def timers(self, timers, names, rank_normalize: bool = True) -> "Counters":
        """Fold phase timers in, normalized by rank count like the reference
        (join_benchmark.cc:48-60)."""
        for n in names:
            ms = timers.sum_ms(n)
            ranks = max(1, timers.rank_count(n)) if rank_normalize else 1
            self.values[f"{n}_ms"] = ms / ranks
        return self

    def to_json(self) -> str:
        return json.dumps({"name": self.name, **self.values})

    def emit(self, file=None) -> None:
        print(self.to_json(), file=file or sys.stdout, flush=True)
