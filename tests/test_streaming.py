"""stream_rounds pipeline semantics: ordering, bounding, overlap, errors.

The round-4 pipeline runs collect() on an ordered background worker so
copy-out overlaps the next round's dispatch (the reference's per-rank async
callback chains, dpuext.hpp:859-875)."""

import threading
import time

import pytest

from dpu_olap_tpu.parallel.streaming import round_geometry, stream_rounds
from dpu_olap_tpu.timer import Timers


def test_results_ordered_with_slow_collect():
    # a slow early collect must not reorder or drop later rounds
    def stage(r):
        return r

    def dispatch(r, staged):
        return staged * 10

    def collect(r, h):
        if r == 0:
            time.sleep(0.05)
        return h + 1

    out = stream_rounds(8, stage, dispatch, collect)
    assert out == [r * 10 + 1 for r in range(8)]


def test_collect_overlaps_dispatch():
    # dispatch of round r+1 proceeds while round r's collect runs on the
    # background worker (collects themselves stay ordered/serial): 4 rounds
    # of 30ms dispatch + 30ms collect = 240ms serial; pipelined, collect r
    # hides under dispatch r+1, so wall ~ 4*30 + 30 = 150ms
    def stage(r):
        return r

    def dispatch(r, staged):
        time.sleep(0.03)
        return staged

    def collect(r, h):
        time.sleep(0.03)
        return h

    t0 = time.perf_counter()
    out = stream_rounds(4, stage, dispatch, collect, max_inflight=2)
    wall = time.perf_counter() - t0
    assert out == list(range(4))
    assert wall < 0.21, f"collect did not overlap dispatch: {wall:.3f}s"


def test_inflight_bound_respected():
    # at most max_inflight dispatched-but-uncollected rounds at any moment
    live = 0
    peak = 0
    lock = threading.Lock()

    def stage(r):
        return r

    def dispatch(r, staged):
        nonlocal live, peak
        with lock:
            live += 1
            peak = max(peak, live)
        return staged

    def collect(r, h):
        nonlocal live
        time.sleep(0.01)
        with lock:
            live -= 1
        return h

    out = stream_rounds(10, stage, dispatch, collect, max_inflight=2)
    assert out == list(range(10))
    # bound counts rounds dispatched before the oldest collect completes:
    # the new round is dispatched after the drain, so peak <= max_inflight+1
    assert peak <= 3, peak


def test_collect_error_propagates():
    def stage(r):
        return r

    def dispatch(r, staged):
        return staged

    def collect(r, h):
        if r == 2:
            raise ValueError("boom")
        return h

    with pytest.raises(ValueError, match="boom"):
        stream_rounds(5, stage, dispatch, collect)


def test_timers_populated():
    t = Timers()
    stream_rounds(3, lambda r: r, lambda r, s: s, lambda r, h: h, timers=t)
    assert t.sum_ms("stage") >= 0
    assert t.rank_count("collect") >= 1


def test_round_geometry_even_division():
    rpr, rounds = round_geometry(16, 4, 1 << 10, round_rows=1 << 13)
    assert rpr * rounds == 4  # 16 batches / 4 devices
    assert rpr * 4 * (1 << 10) <= (1 << 13)
