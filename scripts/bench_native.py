#!/usr/bin/env python
"""Host memcpy microbenchmark (reference host/memory_utils/memcpy_benchmark.cc:
2Ki-2Mi ints x {2,4,8,16} threads, bytes/s) plus partition-slab append rates.
Emits JSON lines."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from dpu_olap_tpu import native


def bench(fn, iters=7):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    if not native.available():
        print(json.dumps({"error": "native runtime unavailable"}))
        return
    rng = np.random.default_rng(42)
    for log2n in [11, 15, 19, 21, 23]:
        n = 1 << log2n
        src = rng.integers(0, 2**32, n, dtype=np.uint32)
        dst = np.zeros_like(src)
        for threads in [1, 2, 4, 8, 16]:
            sec = bench(lambda: native.parallel_memcpy(dst, src, nthreads=threads))
            print(
                json.dumps(
                    {
                        "name": "parallel_memcpy",
                        "ints": n,
                        "threads": threads,
                        "bytes_per_s": n * 4 / sec,
                    }
                )
            )

    # partition slab append rate (Partition::Write analog)
    slab = native.PartitionSlab([np.uint32], capacity_rows=1 << 24)
    chunk = rng.integers(0, 2**32, 1 << 16, dtype=np.uint32)

    def appends():
        for _ in range(64):
            slab.append(chunk)

    sec = bench(appends, iters=3)
    print(
        json.dumps(
            {
                "name": "partition_slab_append",
                "rows_per_s": 64 * (1 << 16) / sec,
                "bytes_per_s": 64 * (1 << 16) * 4 / sec,
            }
        )
    )


if __name__ == "__main__":
    main()
