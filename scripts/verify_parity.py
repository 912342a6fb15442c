#!/usr/bin/env python
"""End-to-end parity checker: every operator, device path vs pyarrow oracle.

The runnable form of the test suite's differential discipline (SURVEY §4) for
arbitrary scale: seeded workloads at the requested SF, exact equality after
canonical sort, one PASS/FAIL line per operator and a non-zero exit on any
mismatch. Runs on whatever platform is ambient (the real chip by default;
FORCE_CPU=1 for the virtual mesh).

Usage: [SF=2] [FORCE_CPU=1] python scripts/verify_parity.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if os.environ.get("FORCE_CPU") == "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import numpy as np


def main() -> int:
    import jax

    if os.environ.get("FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    import pyarrow as pa
    import pyarrow.compute as pc

    from dpu_olap_tpu.generator import (
        make_filter_batches,
        make_join_tables,
        make_take_batches,
    )
    from dpu_olap_tpu.operators import (
        FilterNative,
        FilterTpu,
        JoinNative,
        JoinTpu,
        SumNative,
        SumTpu,
        TakeNative,
        TakeTpu,
    )
    from dpu_olap_tpu.parallel.mesh import DeviceSet

    sf = int(os.environ.get("SF", "1"))
    ds = DeviceSet.allocate()
    d = ds.nr_devices
    failures = 0

    # REFERENCE_SHAPES=1: the reference's real per-SF workload shapes
    # (BASELINE.md) — filter SF*128 x 64Ki, take SF x 4Mi/512Ki, join SF x
    # 2Mi per side — instead of the scaled-down defaults. Used for the
    # committed reference-batch-count parity evidence (PARITY_RUNS.md).
    ref_shapes = os.environ.get("REFERENCE_SHAPES") == "1"

    def report(name, ok, detail=""):
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
        if not ok:
            failures += 1

    # filter
    if ref_shapes:
        nb = max(d, (sf * 128 // d) * d or d)
        batch_rows = 1 << 16
    else:
        nb = max(d, (sf * 8 // d) * d or d)
        batch_rows = 1 << 14
    table = make_filter_batches(nb, batch_rows)
    got = FilterTpu(ds, table).Prepare().Run()
    exp = FilterNative(table).Prepare().Run()
    ok = len(got) == len(exp) and all(np.array_equal(g, e) for g, e in zip(got, exp))
    report("filter", ok, f"{nb} batches x {batch_rows >> 10}Ki")

    # sum
    got_s = SumTpu(ds, table).Prepare().Run()
    exp_s = SumNative(table).Prepare().Run()
    report("sum", got_s == exp_s, f"result={got_s}")

    # take
    if ref_shapes:
        data, idx = make_take_batches(max(d, sf), 1 << 22, 1 << 19)
    else:
        data, idx = make_take_batches(nb, 1 << 14, 1 << 11)
    got_t = TakeTpu(ds, data, idx).Prepare().Run()
    exp_t = TakeNative(data, idx).Prepare().Run()
    report("take", all(np.array_equal(g, e) for g, e in zip(got_t, exp_t)))

    # join (exact table equality after canonical sort)
    if ref_shapes:
        jb = max(d, (sf // d) * d or d)
        left, right = make_join_tables(jb, 1 << 21, 1 << 21)
    else:
        left, right = make_join_tables(nb, 1 << 12, 1 << 11)
    got_j = JoinTpu(ds, left, right).Prepare().Run()
    exp_j = JoinNative(left, right).Prepare().Run().select(["fk", "y", "x"])
    gt = pa.Table.from_arrays(
        [pa.array(got_j[n]) for n in ["fk", "y", "x"]], names=["fk", "y", "x"]
    )
    key = [(n, "ascending") for n in ["fk", "y", "x"]]
    report(
        "join",
        gt.num_rows == exp_j.num_rows and gt.sort_by(key).equals(exp_j.sort_by(key)),
        f"{gt.num_rows} rows",
    )

    print(f"{'ALL PARITY CHECKS PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
