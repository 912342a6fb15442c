"""Round-3 measurement campaign on the real TPU (chained-difference timing).

Feeds the take/sum/probe redesigns (VERDICT round 2 items 1, 6, 7). Run
sections selectively:  python scripts/measure_r3.py sum take ...
Appends results to MEASURE_R3.json.
"""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from dpu_olap_tpu.bench.device_time import time_chained  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "MEASURE_R3.json"
results = {}
if OUT.exists():
    results = json.loads(OUT.read_text())


def record(section, name, ms, note=""):
    results.setdefault(section, {})[name] = {"ms": ms, "note": note}
    print(f"[{section}] {name}: {ms:.3f} ms  {note}", flush=True)
    OUT.write_text(json.dumps(results, indent=1))


def measure_sum():
    from dpu_olap_tpu.ops.aggregate import _sum_pallas_pair, _sum_xla_pair

    n = 8 << 20
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32)
    )
    jax.block_until_ready(x)

    def step_xla(c):
        lo, hi = _sum_xla_pair(c)
        return c ^ (lo & jnp.uint32(1))

    sec = time_chained(step_xla, x, k=64)
    record("sum", "xla_8Mi", sec * 1e3, f"{n*4/sec/1e9:.0f} GB/s")

    for r in (256, 512, 1024, 2048, 4096):
        def step(c, r=r):
            lo, hi = _sum_pallas_pair(c, r=r)
            return c ^ (lo & jnp.uint32(1))

        sec = time_chained(step, x, k=64)
        record("sum", f"pallas_r{r}_8Mi", sec * 1e3, f"{n*4/sec/1e9:.0f} GB/s")


def measure_take():
    """Gather-rate landscape for the BM_Take shape (512Ki idx / 4Mi data)."""
    rng = np.random.default_rng(42)
    n_idx = 512 << 10

    # (a) row-gather rate vs row width W at fixed 16MB table
    n_data = 4 << 20
    data = jnp.asarray(rng.integers(0, 2**32, n_data, dtype=np.uint32))
    for w in (8, 16, 32, 64, 128):
        tbl = data.reshape(-1, w)
        ridx = jnp.asarray(
            rng.integers(0, n_data // w, n_idx, dtype=np.uint32)
        ).astype(jnp.int32)
        jax.block_until_ready((tbl, ridx))

        def step(c, tbl=tbl):
            rows = jnp.take(tbl, c, axis=0)
            return c ^ (rows[:, 0] & jnp.uint32(1)).astype(jnp.int32)

        sec = time_chained(step, ridx, k=4)
        record(
            "rowgather_w", f"w{w}_16MB", sec * 1e3,
            f"{n_idx/sec/1e6:.0f} M rows/s",
        )

    # (b) row-gather rate vs table size at width 128
    for mb in (1, 2, 4, 8, 16, 32):
        nd = mb << 18  # mb MB of uint32
        tbl = data[:nd].reshape(-1, 128)
        ridx = jnp.asarray(
            rng.integers(0, nd // 128, n_idx, dtype=np.uint32)
        ).astype(jnp.int32)
        jax.block_until_ready((tbl, ridx))

        def step(c, tbl=tbl):
            rows = jnp.take(tbl, c, axis=0)
            return c ^ (rows[:, 0] & jnp.uint32(1)).astype(jnp.int32)

        sec = time_chained(step, ridx, k=4)
        record(
            "rowgather_sz", f"{mb}MB_w128", sec * 1e3,
            f"{n_idx/sec/1e6:.0f} M rows/s",
        )

    # (c) sorted vs random indices (locality / indices_are_sorted hint)
    tbl = data.reshape(-1, 128)
    ridx_np = rng.integers(0, n_data // 128, n_idx, dtype=np.uint32)
    for name, idx_np in (("rand", ridx_np), ("sorted", np.sort(ridx_np))):
        ridx = jnp.asarray(idx_np).astype(jnp.int32)
        jax.block_until_ready(ridx)

        def step(c, tbl=tbl):
            rows = jnp.take(tbl, c, axis=0)
            return c ^ (rows[:, 0] & jnp.uint32(1)).astype(jnp.int32)

        sec = time_chained(step, ridx, k=4)
        record(
            "rowgather_order", f"{name}_16MB_w128", sec * 1e3,
            f"{n_idx/sec/1e6:.0f} M rows/s",
        )

    # (d) element gather with sorted vs random indices (hint path)
    eidx_np = rng.integers(0, n_data, n_idx, dtype=np.uint32)
    for name, idx_np in (("rand", eidx_np), ("sorted", np.sort(eidx_np))):
        eidx = jnp.asarray(idx_np).astype(jnp.int32)
        jax.block_until_ready(eidx)

        def step(c):
            out = jnp.take(data, c)
            return c ^ (out & jnp.uint32(1)).astype(jnp.int32)

        sec = time_chained(step, eidx, k=4)
        record(
            "elemgather_order", f"{name}_16MB", sec * 1e3,
            f"{n_idx/sec/1e6:.0f} M idx/s",
        )

    # (e) gather through lax.gather with indices_are_sorted=True, sorted idx
    sidx = jnp.asarray(np.sort(ridx_np)).astype(jnp.int32)
    jax.block_until_ready(sidx)

    def step_hint(c):
        rows = jnp.take(tbl, c, axis=0, indices_are_sorted=True)
        return c ^ (rows[:, 0] & jnp.uint32(1)).astype(jnp.int32)

    sec = time_chained(step_hint, sidx, k=4)
    record(
        "rowgather_order", "sorted_hint_16MB_w128", sec * 1e3,
        f"{n_idx/sec/1e6:.0f} M rows/s",
    )


if __name__ == "__main__":
    sections = sys.argv[1:] or ["sum"]
    for s in sections:
        globals()[f"measure_{s}"]()
