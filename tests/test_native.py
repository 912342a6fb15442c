import numpy as np
import pytest

from dpu_olap_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_parallel_memcpy_exact(rng):
    src = rng.integers(0, 2**32, size=1 << 21, dtype=np.uint32)
    dst = np.zeros_like(src)
    native.parallel_memcpy(dst, src, nthreads=8)
    np.testing.assert_array_equal(dst, src)


def test_parallel_memcpy_small_and_odd(rng):
    for n in [1, 63, 64, 65, 4097]:
        src = rng.integers(0, 256, size=n, dtype=np.uint8)
        dst = np.zeros_like(src)
        native.parallel_memcpy(dst, src, nthreads=4)
        np.testing.assert_array_equal(dst, src)


def test_partition_slab_append_and_views(rng):
    slab = native.PartitionSlab([np.uint32, np.uint32], capacity_rows=1024)
    a = rng.integers(0, 2**32, size=300, dtype=np.uint32)
    b = rng.integers(0, 2**32, size=300, dtype=np.uint32)
    start = slab.append(a, b)
    assert start == 0
    c = rng.integers(0, 2**32, size=200, dtype=np.uint32)
    d = rng.integers(0, 2**32, size=200, dtype=np.uint32)
    slab.append(c, d)
    assert slab.rows == 500
    np.testing.assert_array_equal(slab.column(0), np.concatenate([a, c]))
    np.testing.assert_array_equal(slab.column(1), np.concatenate([b, d]))


def test_partition_slab_overflow():
    slab = native.PartitionSlab([np.uint32], capacity_rows=10)
    slab.reserve(8)
    with pytest.raises(OverflowError):  # partition.cc:19-26 throw analog
        slab.reserve(8)
    # failed reservation must roll back: remaining capacity still usable
    assert slab.reserve(2) == 8


def test_timers_accumulate():
    import time

    t = native.NativeTimers()
    for rank in range(3):
        t.start("phase", rank)
    time.sleep(0.01)
    for rank in range(3):
        t.stop("phase", rank)
    assert t.rank_count("phase") == 3
    assert t.sum_ms("phase") >= 3 * 10 * 0.9  # summed across ranks
    assert t.sum_ns("missing") == 0


def test_executor_ordering_and_sync(rng):
    # FIFO within a queue: later writes to the same dst win.
    ex = native.OrderedExecutor(4)
    dst = np.zeros(1 << 16, dtype=np.uint32)
    first = np.full(1 << 16, 1, dtype=np.uint32)
    second = np.full(1 << 16, 2, dtype=np.uint32)
    for _ in range(50):
        ex.submit_memcpy(0, dst, first)
        ex.submit_memcpy(0, dst, second)
    ex.sync()
    np.testing.assert_array_equal(dst, second)


def test_executor_partition_write(rng):
    ex = native.OrderedExecutor(2)
    slab = native.PartitionSlab([np.uint32], capacity_rows=4096)
    chunks = [rng.integers(0, 2**32, size=512, dtype=np.uint32) for _ in range(8)]
    starts = [slab.reserve(512) for _ in range(8)]
    for q, (s, c) in enumerate(zip(starts, chunks)):
        ex.submit_partition_write(q % 2, slab, 0, c, s)
    ex.sync()
    got = slab.column(0)
    for s, c in zip(starts, chunks):
        np.testing.assert_array_equal(got[s : s + 512], c)
