#!/usr/bin/env python
"""Flagship benchmark: the partitioned hash join (BM_JoinDpu analog).

Workload (host/join/join_benchmark.cc:168-176, seed 42): SF batches x 2Mi
rows per side; right = (pk sequential, x random uint32), left = (fk uniform
within matching pk batch, y random uint32); inner join fk == pk. Metric:
joined rows/s on the device pipeline, with pyarrow's hash join on this host
as vs_baseline.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Detailed per-operator results go to BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from dpu_olap_tpu.bench.harness import time_fn
    from dpu_olap_tpu.generator import make_join_tables, make_filter_batches
    from dpu_olap_tpu.ops.filter import filter_compact
    from dpu_olap_tpu.ops.aggregate import sum_u64_pair
    from dpu_olap_tpu.ops.join import join_shard
    from dpu_olap_tpu.ops.take import take

    sf = int(os.environ.get("SF", "1"))
    rows = sf * (1 << 21)  # SF x 2Mi rows per side
    details = {"devices": [str(d) for d in jax.devices()], "sf": sf, "rows": rows}

    # ---- flagship: single-chip join ---------------------------------------
    left, right = make_join_tables(1, rows, rows)
    lb, rb = left[0], right[0]
    lf, ly = lb["fk"], lb["y"]
    rk, rx = rb["pk"], rb["x"]

    def run_join():
        return join_shard(lf, (ly,), rk, (rx,))

    join_sec = time_fn(run_join, warmup=2, iters=5)
    join_rows_per_s = rows / join_sec
    details["join_real_ms"] = join_sec * 1e3
    details["join_rows_per_s"] = join_rows_per_s

    # correctness spot check
    fk, (y,), (x,), matched = run_join()
    assert bool(jnp.all(matched)), "join must match every left row"

    # ---- pyarrow baseline (the reference's native engine) -----------------
    import pyarrow as pa

    lt = pa.Table.from_batches([lb.to_arrow()])
    rt = pa.Table.from_batches([rb.to_arrow()])
    t0 = time.perf_counter()
    joined = lt.join(rt, keys="fk", right_keys="pk", join_type="inner")
    arrow_sec = time.perf_counter() - t0
    assert joined.num_rows == rows
    details["arrow_join_real_ms"] = arrow_sec * 1e3
    details["arrow_join_rows_per_s"] = rows / arrow_sec

    # ---- secondary operator metrics ---------------------------------------
    ft = make_filter_batches(1, min(rows * 4, 1 << 23))
    fa = ft[0]["a"]
    filter_sec = time_fn(lambda: filter_compact(fa), warmup=2, iters=5)
    details["filter_rows_per_s"] = int(fa.shape[0]) / filter_sec
    details["filter_gb_per_s"] = int(fa.shape[0]) * 4 / filter_sec / 1e9

    sum_sec = time_fn(lambda: sum_u64_pair(fa), warmup=2, iters=5)
    details["sum_rows_per_s"] = int(fa.shape[0]) / sum_sec

    idx = jnp.asarray(
        np.random.default_rng(42).integers(0, rows, size=rows // 4, dtype=np.uint32)
    )
    take_sec = time_fn(lambda: take(rx, idx), warmup=2, iters=5)
    details["take_rows_per_s"] = int(idx.shape[0]) / take_sec

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "join_rows_per_s",
                "value": join_rows_per_s,
                "unit": "rows/s",
                "vs_baseline": join_rows_per_s / (rows / arrow_sec),
            }
        )
    )


if __name__ == "__main__":
    main()
