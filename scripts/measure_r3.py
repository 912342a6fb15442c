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


ROOFLINE_GBPS = 900.0  # v5e HBM ~819 GB/s measured; guard uses a generous bound


def record(section, name, ms, note="", nbytes=None):
    """Persist one measurement. Sanity guard (round-3 verdict item 6): a
    time below the HBM-roofline floor for the op's minimum byte traffic is
    physically impossible — XLA dead-coded the op (the CLAUDE.md trap) — so
    the cell is flagged suspect_dce instead of sitting silently next to
    real data."""
    entry = {"ms": ms, "note": note}
    floor_ms = 0.004
    if nbytes is not None:
        floor_ms = max(floor_ms, nbytes / (ROOFLINE_GBPS * 1e9) * 1e3)
    if ms < floor_ms:
        entry["suspect_dce"] = True
        entry["floor_ms"] = floor_ms
        print(
            f"[{section}] {name}: {ms:.6f} ms BELOW FLOOR {floor_ms:.4f} ms"
            " — DCE suspect, untrustworthy",
            flush=True,
        )
    else:
        print(f"[{section}] {name}: {ms:.3f} ms  {note}", flush=True)
    results.setdefault(section, {})[name] = entry
    OUT.write_text(json.dumps(results, indent=1))


def measure_sum():
    from dpu_olap_tpu.ops.aggregate import _sum_pallas_pair, _sum_xla_pair

    # HBM honesty (round 4): at 8Mi the 33MB chain carry fits v5e's VMEM and
    # XLA keeps it resident — k=512 chains measured ~1150 GB/s, ABOVE the
    # 819 GB/s HBM roofline. The 64Mi (256MB) points below are the true
    # HBM-resident rates; the 8Mi points document the VMEM-assisted regime.
    for nbig, tag in ((64 << 20, "64Mi"), (32 << 20, "32Mi")):
        xb = jnp.asarray(
            np.random.default_rng(1).integers(0, 2**32, nbig, dtype=np.uint32)
        )
        jax.block_until_ready(xb)

        def stepb(c):
            lo, hi = _sum_pallas_pair(c, r=4096)
            return c ^ (lo & jnp.uint32(1))

        sec = time_chained(stepb, xb, k=32)
        record("sum", f"pallas_r4096_{tag}", sec * 1e3,
               f"{nbig*4/sec/1e9:.0f} GB/s", nbytes=nbig * 4)
        del xb

    n = 8 << 20
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32)
    )
    jax.block_until_ready(x)

    def step_xla(c):
        lo, hi = _sum_xla_pair(c)
        return c ^ (lo & jnp.uint32(1))

    # k=512: at ~0.04ms/op a k=64 chain's K->2K delta sits inside tunnel
    # noise (round-4 re-run flagged every cell below the roofline floor)
    sec = time_chained(step_xla, x, k=512)
    record("sum", "xla_8Mi", sec * 1e3, f"{n*4/sec/1e9:.0f} GB/s", nbytes=n * 4)

    for r in (256, 512, 1024, 2048, 4096):
        def step(c, r=r):
            lo, hi = _sum_pallas_pair(c, r=r)
            return c ^ (lo & jnp.uint32(1))

        sec = time_chained(step, x, k=512)
        record("sum", f"pallas_r{r}_8Mi", sec * 1e3, f"{n*4/sec/1e9:.0f} GB/s", nbytes=n * 4)


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
            # lane-sum keeps ALL W gathered columns live (rows[:, 0] let
            # XLA narrow the gather to one column -> impossible numbers)
            rows = jnp.take(tbl, c, axis=0)
            return c ^ (rows.sum(axis=1) & jnp.uint32(1)).astype(jnp.int32)

        sec = time_chained(step, ridx, k=8)
        record(
            "rowgather_w", f"w{w}_16MB", sec * 1e3,
            f"{n_idx/sec/1e6:.0f} M rows/s", nbytes=n_idx * w * 4,
        )

    # (b) row-gather rate vs table size at width 128 (generate per size:
    # data[] holds only 16MB, so slicing silently truncated the 32MB point)
    for mb in (1, 2, 4, 8, 16, 32):
        nd = mb << 18  # mb MB of uint32
        tbl = jnp.asarray(
            rng.integers(0, 2**32, nd, dtype=np.uint32)
        ).reshape(-1, 128)
        ridx = jnp.asarray(
            rng.integers(0, nd // 128, n_idx, dtype=np.uint32)
        ).astype(jnp.int32)
        jax.block_until_ready((tbl, ridx))

        def step(c, tbl=tbl):
            rows = jnp.take(tbl, c, axis=0)
            return c ^ (rows.sum(axis=1) & jnp.uint32(1)).astype(jnp.int32)

        sec = time_chained(step, ridx, k=8)
        record(
            "rowgather_sz", f"{mb}MB_w128", sec * 1e3,
            f"{n_idx/sec/1e6:.0f} M rows/s", nbytes=n_idx * 128 * 4,
        )

    # (c) sorted vs random indices (locality / indices_are_sorted hint)
    tbl = data.reshape(-1, 128)
    ridx_np = rng.integers(0, n_data // 128, n_idx, dtype=np.uint32)
    for name, idx_np in (("rand", ridx_np), ("sorted", np.sort(ridx_np))):
        ridx = jnp.asarray(idx_np).astype(jnp.int32)
        jax.block_until_ready(ridx)

        def step(c, tbl=tbl):
            rows = jnp.take(tbl, c, axis=0)
            return c ^ (rows.sum(axis=1) & jnp.uint32(1)).astype(jnp.int32)

        sec = time_chained(step, ridx, k=8)
        record(
            "rowgather_order", f"{name}_16MB_w128", sec * 1e3,
            f"{n_idx/sec/1e6:.0f} M rows/s", nbytes=n_idx * 128 * 4,
        )

    # (d) element gather with sorted vs random indices (hint path)
    eidx_np = rng.integers(0, n_data, n_idx, dtype=np.uint32)
    for name, idx_np in (("rand", eidx_np), ("sorted", np.sort(eidx_np))):
        eidx = jnp.asarray(idx_np).astype(jnp.int32)
        jax.block_until_ready(eidx)

        def step(c):
            out = jnp.take(data, c)
            return c ^ (out & jnp.uint32(1)).astype(jnp.int32)

        sec = time_chained(step, eidx, k=8)
        record(
            "elemgather_order", f"{name}_16MB", sec * 1e3,
            f"{n_idx/sec/1e6:.0f} M idx/s", nbytes=n_idx * 4,
        )

    # (e) gather through lax.gather with indices_are_sorted=True, sorted idx
    sidx = jnp.asarray(np.sort(ridx_np)).astype(jnp.int32)
    jax.block_until_ready(sidx)

    def step_hint(c):
        rows = jnp.take(tbl, c, axis=0, indices_are_sorted=True)
        return c ^ (rows.sum(axis=1) & jnp.uint32(1)).astype(jnp.int32)

    sec = time_chained(step_hint, sidx, k=8)
    record(
        "rowgather_order", "sorted_hint_16MB_w128", sec * 1e3,
        f"{n_idx/sec/1e6:.0f} M rows/s", nbytes=n_idx * 128 * 4,
    )




def measure_take2():
    """Budget validation for the sort->block-extract->sort take design."""
    from dpu_olap_tpu.ops.sort_pallas import sort_bitonic

    rng = np.random.default_rng(42)
    n_idx = 512 << 10
    idx = jnp.asarray(rng.integers(0, 4 << 20, n_idx, dtype=np.uint32))
    pos = jnp.arange(n_idx, dtype=jnp.uint32)
    jax.block_until_ready((idx, pos))

    for leaf in (2048, 4096, 8192):
        def step(c, leaf=leaf):
            k, p = sort_bitonic((c, pos), leaf=leaf)
            return k ^ (p & jnp.uint32(1))

        sec = time_chained(step, idx, k=32)
        record("take2", f"sort2op_512Ki_leaf{leaf}", sec * 1e3,
               f"{n_idx/sec/1e6:.0f} M/s", nbytes=n_idx * 8)

    # lane-gather throughput inside a trivial Pallas kernel
    from jax.experimental import pallas as pl

    def gk(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    for rows in (8192, 32768):
        x = jnp.asarray(rng.integers(0, 2**31, (rows, 128), dtype=np.int32))
        li = jnp.asarray(rng.integers(0, 128, (rows, 128), dtype=np.int32))
        jax.block_until_ready((x, li))
        f = pl.pallas_call(
            gk, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        )

        def step(c, x=x, f=f):
            # mask back into valid lane-index range so the chain cannot be
            # constant-folded or clamp-degenerate (round-4: the ^1 chain
            # produced below-floor DCE-suspect cells)
            return f(x, c) & jnp.int32(127)

        sec = time_chained(step, li, k=256)
        nb = rows * 128 * 4
        record("take2", f"lanegather_{rows}r", sec * 1e3,
               f"{3*nb/sec/1e9:.0f} GB/s rwr, {rows*128/sec/1e6:.0f} M idx/s",
               nbytes=2 * nb)


def measure_take3():
    """End-to-end take_sorted at the BM_Take shape on the real chip."""
    from dpu_olap_tpu.ops.take_pallas import take_sorted, gather_sorted_pallas
    from dpu_olap_tpu.ops.sort_pallas import sort_bitonic
    from dpu_olap_tpu.ops.take import take as take_old

    rng = np.random.default_rng(42)
    n, k = 4 << 20, 512 << 10
    data = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n, k, dtype=np.uint32))
    jax.block_until_ready((data, idx))

    # correctness on-chip first
    out, flag = take_sorted(data, idx)
    exp = np.asarray(data)[np.asarray(idx)]
    ok = np.array_equal(np.asarray(out), exp)
    print("on-chip parity:", ok, "flag:", int(flag), flush=True)
    assert ok

    for wr in (8, 16, 32):
        def step(c, wr=wr):
            o, f = take_sorted(data, c, window_rows=wr)
            return c ^ (o & jnp.uint32(1)) ^ f.astype(jnp.uint32)

        sec = time_chained(step, idx, k=16)
        record("take3", f"take_sorted_wr{wr}", sec * 1e3,
               f"{k/sec/1e6:.0f} M idx/s", nbytes=k * 8)

    # phase split: kernel alone on pre-sorted input. Total select-tree work
    # scales ~ k * slack * slice_rows (window rows ~ slice*(k/n)*slack), so
    # small slices should win now that the query DMA and output writes are
    # overlapped — sweep down to slice 8.
    sidx = jnp.sort(idx)
    jax.block_until_ready(sidx)
    for sr, wr in (
        (8, 8), (16, 8), (16, 16), (32, 8), (32, 16), (32, 32),
        (64, 32), (128, 64),
    ):
        def stepk(c, sr=sr, wr=wr):
            v, f = gather_sorted_pallas(data, c, slice_rows=sr, window_rows=wr)
            return c ^ (v & jnp.uint32(1)) ^ f.astype(jnp.uint32)

        sec = time_chained(stepk, sidx, k=16)
        record("take3", f"gather_kernel_sr{sr}_wr{wr}", sec * 1e3,
               f"{k/sec/1e6:.0f} M idx/s", nbytes=k * 8)

    # old path for comparison, same process
    def stepo(c):
        return c ^ (take_old(data, c) & jnp.uint32(1))

    sec = time_chained(stepo, idx, k=16)
    record("take3", "take_old", sec * 1e3, f"{k/sec/1e6:.0f} M idx/s",
           nbytes=k * 8)


def measure_probe():
    """Sorted-store hashtable probe parts at the hashtable_test shape
    (1Mi build / 1Mi probe): is the merge stream or a sort the cost?"""
    from dpu_olap_tpu.ops.hashtable import ht_build_sorted, ht_probe_sorted
    from dpu_olap_tpu.ops.merge_pallas import merge_probe_pallas
    from dpu_olap_tpu.ops.sort_pallas import sort_bitonic

    rng = np.random.default_rng(42)
    n = 1 << 20
    keys = jnp.asarray(rng.permutation(np.uint32(4 * n))[:n].astype(np.uint32))
    vals = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    q = jnp.asarray(rng.integers(0, 4 * n, n, dtype=np.uint32))
    jax.block_until_ready((keys, vals, q))
    t = ht_build_sorted(keys, vals)
    jax.block_until_ready(t.keys)

    def step_build(c):
        tt = ht_build_sorted(c, vals)
        # keep BOTH sort operands live (CLAUDE.md: XLA dead-codes unused
        # sort operands; keys-only would time a 1-op sort)
        return c ^ (tt.keys & jnp.uint32(1)) ^ (tt.values & jnp.uint32(2))

    sec = time_chained(step_build, keys, k=8)
    record("probe", "build_sorted_1Mi", sec * 1e3, f"{n/sec/1e6:.0f} M/s",
           nbytes=n * 8)

    def step_merge(c):
        has, pk, (pv,) = merge_probe_pallas(c, t.keys, (t.values,))
        return c ^ (pv & jnp.uint32(1)) ^ has.astype(jnp.uint32)

    sq = jnp.sort(q)
    jax.block_until_ready(sq)
    sec = time_chained(step_merge, sq, k=8)
    record("probe", "merge_stream_1Mi", sec * 1e3, f"{n/sec/1e6:.0f} M/s",
           nbytes=n * 8)

    def step_probe(c):
        got, found = ht_probe_sorted(t, c)
        return c ^ (got & jnp.uint32(1)) ^ found.astype(jnp.uint32)

    sec = time_chained(step_probe, q, k=8)
    record("probe", "probe_sorted_1Mi", sec * 1e3, f"{n/sec/1e6:.0f} M/s",
           nbytes=n * 8)


def measure_dense():
    """Dense-pk gather join phases at the flagship shape (2Mi x 2Mi)."""
    from dpu_olap_tpu.ops.merge_xla import dense_window_rows, join_shard_dense
    from dpu_olap_tpu.ops.sort_pallas import sort_bitonic

    rng = np.random.default_rng(42)
    per = 1 << 21
    fk = jnp.asarray(rng.integers(0, per, per, dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 2**32, per, dtype=np.uint32))
    pk = jnp.arange(per, dtype=jnp.uint32)
    x = jnp.asarray(rng.integers(0, 2**32, per, dtype=np.uint32))
    jax.block_until_ready((fk, y, pk, x))
    wr = dense_window_rows(per, per)

    def step_sort(c):
        k, p = sort_bitonic((c, y))
        return k ^ (p & jnp.uint32(1))

    sec = time_chained(step_sort, fk, k=8)
    record("dense", "probe_sort_2Mi", sec * 1e3, f"{per/sec/1e6:.0f} M/s",
           nbytes=per * 8)

    for w in sorted({32, 64, wr}):
        def step_join(c, w=w):
            key, (yo,), (xo,), m, ovf = join_shard_dense(
                c, (y,), pk, (x,), window_rows=w
            )
            return (
                c ^ (key & jnp.uint32(1)) ^ (yo & jnp.uint32(2))
                ^ (xo & jnp.uint32(4)) ^ m.astype(jnp.uint32)
                ^ ovf.astype(jnp.uint32)
            )

        sec = time_chained(step_join, fk, k=8)
        record("dense", f"join_dense_2Mi_wr{w}", sec * 1e3,
               f"{per/sec/1e6:.0f} M rows/s", nbytes=per * 16)




def measure_dense2():
    """Round-5 slice_rows sweep at the flagship join shape (2Mi x 2Mi,
    ~4096 queries consumed per 32-row table slice). The gather kernel's
    select tree costs ~2*slice_rows passes over the query window, so at
    HIGH query density smaller slices should cut work nearly linearly —
    the opposite regime from BM_Take (take3: 512 queries/slice, where
    per-step fixed costs made sr8 LOSE). All candidates interleaved in one
    process; overflow flags asserted zero."""
    from dpu_olap_tpu.bench.device_time import time_chained_multi
    from dpu_olap_tpu.ops.merge_xla import join_shard_dense

    rng = np.random.default_rng(42)
    per = 1 << 21
    fk = jnp.asarray(rng.integers(0, per, per, dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 2**32, per, dtype=np.uint32))
    pk = jnp.arange(per, dtype=jnp.uint32)
    x = jnp.asarray(rng.integers(0, 2**32, per, dtype=np.uint32))
    jax.block_until_ready((fk, y, pk, x))

    def mk(sr, wr):
        def step(c):
            key, (yo,), (xo,), m, ovf = join_shard_dense(
                c, (y,), pk, (x,), window_rows=wr, slice_rows=sr
            )
            return (
                c ^ (key & jnp.uint32(1)) ^ (yo & jnp.uint32(2))
                ^ (xo & jnp.uint32(4)) ^ m.astype(jnp.uint32)
                ^ ovf.astype(jnp.uint32)
            )
        return step

    # Poisson-safe minima per slice size (default_window_rows): sr32 -> 40,
    # sr16 -> 24, sr8 -> 16. sr4 violates the 8-sublane block minimum; wr32
    # at sr32 overflows (the round-3 dense wr32 sweep point predates the
    # overflow exclusion and measured an overflowed run).
    cands = [(32, 40), (16, 24), (16, 32), (8, 16), (8, 24)]
    # overflow check once per candidate (untimed)
    live = []
    for sr, wr in cands:
        ovf = join_shard_dense(
            fk, (y,), pk, (x,), window_rows=wr, slice_rows=sr
        )[4]
        if int(np.asarray(ovf)):
            record("dense2", f"join_dense_sr{sr}_wr{wr}", -1.0,
                   "OVERFLOW — excluded")
        else:
            live.append((sr, wr))
    res = time_chained_multi(
        [(f"sr{sr}_wr{wr}", mk(sr, wr), fk, 8) for sr, wr in live]
    )
    for name, sec in res.items():
        record("dense2", f"join_dense_{name}", sec * 1e3,
               f"{per/sec/1e6:.0f} M rows/s", nbytes=per * 16)


def measure_take4():
    """Non-interpret window-overflow retry (round-4, verdict item 3): an
    adversarially clustered index set overflows the shape-derived window on
    the REAL kernel; take_fast must detect the flag, double the window, and
    return bit-exact results. Records the retry trajectory."""
    from dpu_olap_tpu.ops.take import take_fast
    from dpu_olap_tpu.ops.take_pallas import (
        default_window_rows, take_sorted,
    )

    rng = np.random.default_rng(42)
    n, k = 4 << 20, 512 << 10
    data = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    # all queries hit ONE 4Ki slice: the first window read must overflow
    idx = jnp.asarray(rng.integers(0, 4096, k, dtype=np.uint32))
    jax.block_until_ready((data, idx))

    wr0 = default_window_rows(n, k)
    o, flag0 = take_sorted(data, idx, window_rows=wr0)
    flag0 = int(np.asarray(flag0))
    print(f"[take4] clustered idx: wr={wr0} overflow flag={flag0}",
          flush=True)
    assert flag0 != 0, "adversarial set failed to overflow the window"

    out = take_fast(data, idx)
    exp = np.asarray(data)[np.asarray(idx)]
    ok = bool(np.array_equal(np.asarray(out), exp))
    print(f"[take4] take_fast retry parity: {ok}", flush=True)
    assert ok
    results.setdefault("take4", {})["overflow_retry"] = {
        "initial_window_rows": wr0,
        "initial_flag": flag0,
        "parity_after_retry": ok,
        "note": "non-interpret retry on real TPU; all 512Ki queries in one "
                "4Ki slice",
    }
    OUT.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    sections = sys.argv[1:] or ["sum"]
    for s in sections:
        globals()[f"measure_{s}"]()
