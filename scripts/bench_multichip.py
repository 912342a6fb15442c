#!/usr/bin/env python
"""Multi-chip scaling benchmark for the distributed shuffle join.

Measures joined rows/s at 1 device and at N devices on the same total
workload per device (weak scaling), reporting parallel efficiency — the
BASELINE.md scaling-measurement contract. On a machine with one real chip,
run with FORCE_CPU=1 to exercise the code path on a virtual mesh (functional
validation; absolute numbers are then CPU numbers).

Usage:
  python scripts/bench_multichip.py            # real devices
  FORCE_CPU=1 DEVICES=8 python scripts/bench_multichip.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if os.environ.get("FORCE_CPU") == "1":
    n = os.environ.get("DEVICES", "8")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={n}"
    )

import numpy as np


def main():
    import jax

    if os.environ.get("FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from dpu_olap_tpu.generator import make_join_tables
    from dpu_olap_tpu.ops.join import join_shard_fused
    from dpu_olap_tpu.parallel.dist_join import dist_join
    from dpu_olap_tpu.parallel.mesh import DeviceSet

    n_dev = len(jax.devices())
    rows_per_dev = int(os.environ.get("ROWS_PER_DEV", str(1 << 20)))

    def sync_read(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def run_single():
        left, right = make_join_tables(1, rows_per_dev, rows_per_dev)
        lb, rb = left[0], right[0]
        args = (lb["fk"], (lb["y"],), rb["pk"], (rb["x"],))
        fn = jax.jit(join_shard_fused)
        sync_read(fn(*args))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(*args)
        sync_read(out)
        return rows_per_dev / ((time.perf_counter() - t0) / reps)

    def run_multi():
        ds = DeviceSet.allocate(n_dev)
        total = rows_per_dev * n_dev
        left, right = make_join_tables(1, total, total)
        lb, rb = left[0], right[0]
        sync_read(
            dist_join(ds, lb["fk"], (lb["y"],), rb["pk"], (rb["x"],))
        )
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = dist_join(ds, lb["fk"], (lb["y"],), rb["pk"], (rb["x"],))
        sync_read(out)
        return total / ((time.perf_counter() - t0) / reps)

    single = run_single()
    result = {
        "devices": n_dev,
        "rows_per_device": rows_per_dev,
        "single_rows_per_s": single,
    }
    if n_dev > 1:
        multi = run_multi()
        result["multi_rows_per_s"] = multi
        result["weak_scaling_efficiency"] = multi / (single * n_dev)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
