"""Shared helpers for the CPU baseline scripts.

Reference: baseline/{filter,join,sum,take}.py — pyarrow/polars/datafusion
benchmarks over an SF sweep, CSV rows of
(sf, batches, batch_size, result_rows, real_ms, cpu_ms, rss_kib).
polars/datafusion are gated on availability (not in this image).
"""

from __future__ import annotations

import csv
import os
import resource
import sys
import time


def measure(fn):
    """Run fn once; returns (result, real_ms, cpu_ms, rss_kib)."""
    t0 = time.perf_counter()
    c0 = time.process_time()
    result = fn()
    real_ms = (time.perf_counter() - t0) * 1e3
    cpu_ms = (time.process_time() - c0) * 1e3
    rss_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    return result, real_ms, cpu_ms, rss_kib


def emit_csv(rows, header, path=None):
    out = open(path, "w", newline="") if path else sys.stdout
    w = csv.writer(out)
    w.writerow(header)
    w.writerows(rows)
    if path:
        out.close()


def sf_sweep():
    """SF values: env SF for a single point, else 2^0..2^4 (the reference
    sweeps to 2^11 on big machines; keep local default small)."""
    if os.environ.get("SF"):
        return [int(os.environ["SF"])]
    return [1 << i for i in range(5)]


def have_polars():
    try:
        import polars  # noqa: F401

        return True
    except ImportError:
        return False


def have_datafusion():
    try:
        import datafusion  # noqa: F401

        return True
    except ImportError:
        return False


def datafusion_ctx_from_batches(name, batches):
    """Register Arrow RecordBatches as a DataFusion table, returning the
    SessionContext (reference baseline/join.py:31-37 registers record
    batches the same way)."""
    import datafusion

    ctx = datafusion.SessionContext()
    ctx.register_record_batches(name, [batches])
    return ctx


def measure_point(fn, *args, **kwargs):
    """Run one benchmark point in a FRESH child process and return its
    (result, real_ms, cpu_ms, rss_kib).

    The reference runs every (sf, engine) point in its own
    multiprocessing.Process and records RSS per process
    (/root/reference/baseline/filter.py:6, run loop :60-78); in-process
    sweeps let allocator/cache state leak across points (this repo measured
    2x cross-process variance on identical code) and make ru_maxrss a
    whole-sweep high-water mark instead of a per-point figure.
    ISOLATE=0 disables (fast differential tests)."""
    if os.environ.get("ISOLATE", "1") == "0":
        return fn(*args, **kwargs)
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    q = ctx.SimpleQueue()

    def child():
        try:
            q.put(("ok", fn(*args, **kwargs)))
        except BaseException as e:  # surface the child's failure, not a hang
            q.put(("err", repr(e)))

    p = ctx.Process(target=child)
    p.start()
    status, payload = q.get()
    p.join()
    if status == "err":
        raise RuntimeError(f"baseline child failed: {payload}")
    return payload
