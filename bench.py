#!/usr/bin/env python
"""Flagship benchmark: the partitioned hash join (BM_JoinDpu analog).

Workload (host/join/join_benchmark.cc:168-176, seed 42): SF batches x 2Mi
rows per side; right = (pk sequential, x random uint32), left = (fk uniform
within matching pk batch, y random uint32); inner join fk == pk. Metric:
joined rows/s for the fused device join, with pyarrow's hash join on this
host as vs_baseline.

Timing uses device-side chained repetition (bench/device_time.py): on
tunneled TPU backends block_until_ready acks at enqueue and host sync costs
~30ms, so each op is run K and 2K times inside one jit with a data dependence
between iterations and timed by difference — fixed latency cancels.

Repetition protocol (the reference runs everything with
--benchmark_repetitions=3, scripts/run-upmem-2048.sh:17, and round-4's
single samples spread 45% across identical-code runs): the default
invocation forks BENCH_REPS (default 3) fresh worker processes — the
baseline-isolation pattern — and reports the MEDIAN, with per-metric
samples/median/min/spread committed to BENCH_DETAILS.json. Phase
attribution runs interleaved inside one process (time_chained_multi) and
is guarded against negative / >110%-of-total decompositions.

Prints exactly ONE JSON line; per-operator details go to BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def run_worker():
    # persistent compile cache: tunnel-side TPU compiles are slow; reuse them
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp

    from dpu_olap_tpu.bench.device_time import time_chained, time_chained_multi
    from dpu_olap_tpu.generator import make_join_tables, make_filter_batches
    from dpu_olap_tpu.ops.filter import filter_compact
    from dpu_olap_tpu.ops.aggregate import sum_u64_pair
    from dpu_olap_tpu.ops.take import take

    sf = int(os.environ.get("SF", "1"))
    per = 1 << 21  # reference batch size: 2Mi rows per side per batch
    rows = sf * per  # SF batches x 2Mi rows per side

    # Backend init is the one step that fails when the axon tunnel is away;
    # a transient outage must yield one parseable JSON line (skipped), not a
    # traceback with rc=1 (round-3 BENCH_r03.json lost the round's record
    # that way). Retry once after a pause, then degrade gracefully.
    devices = None
    for attempt in range(2):
        try:
            devices = jax.devices()
            break
        except RuntimeError as e:  # Unable to initialize backend
            err = str(e).splitlines()[-1] if str(e) else repr(e)
            _log(f"backend init failed (attempt {attempt + 1}/2): {err}")
            if attempt == 0:
                time.sleep(30)
    if devices is None:
        print(
            json.dumps(
                {
                    "metric": "join_rows_per_s",
                    "value": None,
                    "unit": "rows/s",
                    "vs_baseline": None,
                    "skipped": True,
                    "reason": f"TPU backend unavailable: {err}",
                }
            )
        )
        return
    details = {"devices": [str(d) for d in devices], "sf": sf, "rows": rows}

    # ---- flagship: fused co-sort join over SF reference batches -----------
    # The reference joins each 2Mi batch pair independently and streams
    # batches through fixed device buffers (join_benchmark.cc:168-176,
    # join_dpu.cc); here the SF batch pairs are stacked on a leading axis and
    # a lax.scan joins them back-to-back inside one program, so rows/s stays
    # flat in SF (working-set streaming is the operators' round loop; the
    # flagship measures steady-state per-batch throughput).
    left, right = make_join_tables(sf, per, per)
    # Workload-structure detection on the host-resident columns (the
    # operator's JoinTpu.Prepare does the same): keys31 packs side into the
    # sort key; a sorted pk column selects the bitonic-merge join.
    from dpu_olap_tpu.ops.join import join_shard_auto

    lim = np.uint32(0x7FFFFFFF)
    keys31 = all(
        np.max(np.asarray(left[i]["fk"])) < lim
        and np.max(np.asarray(right[i]["pk"])) < lim
        for i in range(sf)
    )
    pk_sorted = all(
        np.all(np.asarray(right[i]["pk"])[1:] >= np.asarray(right[i]["pk"])[:-1])
        for i in range(sf)
    )
    # pk_dense (pk[i] = pk[0] + i within each batch) upgrades the probe to a
    # positional streaming gather (join_shard_dense) — always true for the
    # reference's sequential index pk (generator.cc:59-71). Batches join
    # independently here, so only per-batch density matters.
    pk_dense = pk_sorted and all(
        np.all(np.diff(np.asarray(right[i]["pk"]).astype(np.int64)) == 1)
        for i in range(sf)
    )
    from dpu_olap_tpu.ops.merge_xla import (
        dense_window_rows,
        join_dense_eligible,
        join_shard_dense,
    )

    from dpu_olap_tpu.ops.filter import _on_tpu

    # gather_sorted_pallas is a TPU kernel; off-TPU (debug runs) stay on the
    # XLA auto path
    use_dense = pk_dense and join_dense_eligible(per, per) and _on_tpu()
    details["join_keys31"] = keys31
    details["join_pk_sorted"] = pk_sorted
    details["join_pk_dense"] = use_dense
    lf = jax.device_put(np.stack([np.asarray(left[i]["fk"]) for i in range(sf)]))
    ly = jax.device_put(np.stack([np.asarray(left[i]["y"]) for i in range(sf)]))
    rk = jax.device_put(np.stack([np.asarray(right[i]["pk"]) for i in range(sf)]))
    rx = jax.device_put(np.stack([np.asarray(right[i]["x"]) for i in range(sf)]))
    jax.block_until_ready((lf, ly, rk, rx))

    # dense path: pick a gather window that does not overflow on this data
    # (one untimed probe run + doubling retry, the operator's skew pattern)
    wr = dense_window_rows(per, per)
    if use_dense:
        # capped doubling (each retry recompiles through the tunnel); a
        # workload that still overflows reverts to the auto path
        max_wr = 4 * wr
        while wr <= max_wr:
            ovf = join_shard_dense(
                lf[0], (ly[0],), rk[0], (rx[0],), window_rows=wr
            )[4]
            if int(np.asarray(ovf)) == 0:
                break
            _log(f"dense gather window overflow, retry wr={wr * 2}")
            wr *= 2
        else:
            use_dense = False
            details["join_pk_dense"] = False
        if use_dense:
            _log(f"join path: dense-pk streaming gather (window_rows={wr})")

    def join_one(fk_b, ly_b, rk_b, rx_b):
        if use_dense:
            fk, (y,), (x,), matched, ovf = join_shard_dense(
                fk_b, (ly_b,), rk_b, (rx_b,), window_rows=wr
            )
            return (fk[:per] & jnp.uint32(1)) ^ (y[:per] & jnp.uint32(2)) \
                ^ (x[:per] & jnp.uint32(4)) ^ matched[:per].astype(jnp.uint32) \
                ^ ovf.astype(jnp.uint32)
        fk, (y,), (x,), matched = join_shard_auto(
            fk_b, (ly_b,), rk_b, (rx_b,), keys31=keys31, pk_sorted=pk_sorted
        )
        # keep every output live so XLA cannot dead-code sort operands
        return (fk[:per] & jnp.uint32(1)) ^ (y[:per] & jnp.uint32(2)) \
            ^ (x[:per] & jnp.uint32(4)) ^ matched[:per].astype(jnp.uint32)

    def join_step(c, ly, rk, rx):
        # ly/rk/rx ride as jit ARGUMENTS (time_chained consts): closing
        # over them embeds ~24MB of HLO constants per SF batch, which is
        # what blew the tunnel's HTTP 413 upload limit at SF=16 (r5 sweep)
        def body(_, inp):
            return 0, join_one(*inp)

        _, accs = jax.lax.scan(body, 0, (c, ly, rk, rx))
        return c ^ accs

    # per-phase attribution (join_benchmark.cc:48-60 build/probe/take phase
    # counters analog): chained timing of pipeline prefixes; differences
    # attribute time to sort / propagate / mask+output stages.
    from dpu_olap_tpu.ops.hashtable import EMPTY
    from dpu_olap_tpu.ops.join import _fill_forward

    def rehash(x):
        x = (x ^ jnp.uint32(61)) ^ (x >> jnp.uint32(16))
        x = x + (x << jnp.uint32(3))
        x = x ^ (x >> jnp.uint32(4))
        x = x * jnp.uint32(0x27D4EB2D)
        return x ^ (x >> jnp.uint32(15))

    use_merge = pk_sorted and keys31
    # phase attribution runs on one reference batch (phases are per batch)
    lf0, ly0, rk0, rx0 = lf[0], ly[0], rk[0], rx[0]

    # mirror the production sort selection (merge_xla._sort): the Pallas
    # merge-tree sort on eligible shapes, flat lax.sort otherwise
    from dpu_olap_tpu.ops.filter import _on_tpu
    from dpu_olap_tpu.ops.sort_pallas import sort_bitonic, sortable_bitonic

    def _sort(ops):
        if _on_tpu() and sortable_bitonic(ops[0].shape[0]):
            return list(sort_bitonic(tuple(ops)))
        return jax.lax.sort(ops, num_keys=1)

    def phase_sort(c, ly0, rk0, rx0):
        # probe-side sort only (dense/merge paths) / full concat sort (fused)
        if use_dense:
            out = _sort([c, ly0])
            return rehash((out[0] ^ out[1])[:per])
        if use_merge:
            k2 = (c << jnp.uint32(1)) | jnp.uint32(1)
            out = _sort([k2, ly0])
        elif keys31:
            k2 = jnp.concatenate(
                [rk0 << jnp.uint32(1), (c << jnp.uint32(1)) | jnp.uint32(1)]
            )
            out = _sort([k2, jnp.concatenate([rx0, ly0])])
        else:
            side = jnp.concatenate(
                [jnp.zeros((per,), jnp.int32), jnp.ones((per,), jnp.int32)]
            )
            out = jax.lax.sort(
                [jnp.concatenate([rk0, c]), side, jnp.concatenate([rx0, ly0])],
                num_keys=1,
            )
        acc = out[0] ^ out[-1]
        return rehash(acc[:per])

    def phase_sort_merge(c, ly0, rk0, rx0):
        # sort + gather (dense) / sort + merge (merge) / sort + fill (fused)
        if use_dense:
            from dpu_olap_tpu.ops.take_pallas import gather_sorted_pallas

            sidx, sy = _sort([c, ly0])
            val, f = gather_sorted_pallas(
                rx0, jnp.minimum(sidx, jnp.uint32(per - 1)), window_rows=wr
            )
            return rehash((val ^ sy)[:per] ^ f.astype(jnp.uint32))
        if use_merge:
            from dpu_olap_tpu.ops.merge_xla import bitonic_merge

            k2 = (c << jnp.uint32(1)) | jnp.uint32(1)
            sl_k, sl_y = _sort([k2, ly0])
            n2 = 2 * per
            pad = (1 << (n2 - 1).bit_length()) - n2
            sk2, sm = bitonic_merge(
                (jnp.concatenate([rk0 << jnp.uint32(1),
                                  jnp.full((pad,), 0xFFFFFFFF, jnp.uint32),
                                  sl_k[::-1]]),
                 jnp.concatenate([rx0, jnp.zeros((pad,), jnp.uint32),
                                  sl_y[::-1]]))
            )
            return rehash((sk2 ^ sm)[:per])
        if keys31:
            k2 = jnp.concatenate(
                [rk0 << jnp.uint32(1), (c << jnp.uint32(1)) | jnp.uint32(1)]
            )
            sk2, sm = _sort([k2, jnp.concatenate([rx0, ly0])])
            is_pk = (sk2 & jnp.uint32(1)) == 0
            sk = sk2 >> jnp.uint32(1)
        else:
            side = jnp.concatenate(
                [jnp.zeros((per,), jnp.int32), jnp.ones((per,), jnp.int32)]
            )
            sk, ss, sm = jax.lax.sort(
                [jnp.concatenate([rk0, c]), side, jnp.concatenate([rx0, ly0])],
                num_keys=1,
            )
            is_pk = ss == 0
        pkey, pv = _fill_forward((jnp.where(is_pk, sk, EMPTY), sm))
        return rehash((sk ^ pkey ^ pv)[:per])

    _log("timing join + phases (interleaved chained)...")
    mid_name = "gather" if use_dense else ("merge" if use_merge else "propagate")

    # The join total and both phase prefixes measure INTERLEAVED in one
    # process (time_chained_multi): round-4's separate calls minutes apart
    # let cross-run drift land in the residual phase, committing a
    # physically impossible negative fill time. k=8 on the phase prefixes:
    # at k=2 the K->2K difference is tunnel-noise-dominated (CLAUDE.md).
    def measure():
        return time_chained_multi(
            [
                ("total", join_step, lf, max(2, 8 // sf), (ly, rk, rx)),
                ("sort", phase_sort, lf0, 8, (ly0, rk0, rx0)),
                ("mid", phase_sort_merge, lf0, 8, (ly0, rk0, rx0)),
            ]
        )

    t = measure()
    join_sec = t["total"]
    # phases run on ONE batch, join_sec covers all SF batches: use the
    # per-batch steady-state time for the residual-phase delta
    for attempt in range(2):
        batch = join_sec / sf
        consistent = (
            0 <= t["sort"] <= t["mid"] and t["mid"] <= 1.10 * batch
        )
        if consistent or attempt:
            break
        _log("phase decomposition inconsistent, re-measuring once...")
        t = measure()
        join_sec = t["total"]
    join_rows_per_s = rows / join_sec
    details["join_real_ms"] = join_sec * 1e3
    details["join_rows_per_s"] = join_rows_per_s
    _log(f"join: {join_sec*1e3:.3f} ms -> {join_rows_per_s/1e6:.1f} Mrows/s")

    # raw prefix medians are always committed; the derived decomposition
    # only when it is physically sane (every phase >= 0, sum == total by
    # construction, no prefix exceeding 110% of the total)
    details["join_prefix_sort_ms"] = t["sort"] * 1e3
    details["join_prefix_mid_ms"] = t["mid"] * 1e3
    details["join_phase_consistent"] = bool(consistent)
    if consistent:
        batch = join_sec / sf
        details["join_phase_sort_ms"] = t["sort"] * 1e3
        details[f"join_phase_{mid_name}_ms"] = (t["mid"] - t["sort"]) * 1e3
        details["join_phase_fill_mask_ms"] = max(0.0, batch - t["mid"]) * 1e3
        _log(
            f"join phases: sort={t['sort']*1e3:.2f} "
            f"{mid_name}={(t['mid']-t['sort'])*1e3:.2f} "
            f"fill+mask/output={(batch-t['mid'])*1e3:.2f} ms"
        )
    else:
        _log(
            "join phase decomposition UNRELIABLE after retry "
            f"(sort={t['sort']*1e3:.2f} mid={t['mid']*1e3:.2f} "
            f"batch={join_sec/sf*1e3:.2f} ms) — raw prefixes committed, "
            "derived phases withheld"
        )

    # correctness spot check (forces one real execution of the timed path;
    # count on device to avoid a large readback through the tunnel)
    if use_dense:
        fk, (y,), (x,), matched, _ = join_shard_dense(
            lf0, (ly0,), rk0, (rx0,), window_rows=wr
        )
    else:
        fk, (y,), (x,), matched = join_shard_auto(
            lf0, (ly0,), rk0, (rx0,), keys31=keys31, pk_sorted=pk_sorted
        )
    m = int(np.asarray(jnp.sum(matched.astype(jnp.int32))))
    assert m == per, f"join must match every left row, got {m}/{per}"
    _log("join correctness ok")

    # ---- pyarrow baseline (the reference's native engine) -----------------
    import pyarrow as pa

    lt = pa.Table.from_batches([left[i].to_arrow() for i in range(sf)])
    rt = pa.Table.from_batches([right[i].to_arrow() for i in range(sf)])
    _log("running pyarrow baseline...")
    t0 = time.perf_counter()
    joined = lt.join(rt, keys="fk", right_keys="pk", join_type="inner")
    arrow_sec = time.perf_counter() - t0
    assert joined.num_rows == rows
    details["arrow_join_real_ms"] = arrow_sec * 1e3
    details["arrow_join_rows_per_s"] = rows / arrow_sec

    # ---- secondary operator metrics ---------------------------------------
    nf = min(rows * 4, 1 << 23)
    ft = make_filter_batches(1, nf)
    fa = jax.device_put(np.asarray(ft[0]["a"]))
    jax.block_until_ready(fa)

    _log("timing filter...")

    def filter_step(c):
        out, cnt = filter_compact(c)
        return c ^ (out & jnp.uint32(1)) ^ cnt
    fsec = time_chained(filter_step, fa, k=16)
    details["filter_rows_per_s"] = nf / fsec
    details["filter_gb_per_s"] = nf * 4 / fsec / 1e9
    _log(f"filter: {fsec*1e3:.3f} ms -> {nf*4/fsec/1e9:.1f} GB/s")

    _log("timing sum...")

    def sum_step(c):
        lo, hi = sum_u64_pair(c)
        return c ^ (lo & jnp.uint32(1))
    # k=512: at ~0.03ms/op the K->2K difference needs a long chain to rise
    # above tunnel noise (the Pallas sum is ~5x the old XLA reduction)
    ssec = time_chained(sum_step, fa, k=512)
    details["sum_rows_per_s"] = nf / ssec

    ni = rows // 4
    rx_flat = rx.reshape(-1)
    idx = jnp.asarray(
        np.random.default_rng(42).integers(0, rows, size=ni, dtype=np.uint32)
    ).astype(jnp.int32)
    jax.block_until_ready((idx, rx_flat))

    _log("timing take...")
    # production path: sorted-stream take (sort -> streaming gather -> sort,
    # no random access; measured 362M idx/s vs 171M for the row-gather at
    # the BM_Take shape, MEASURE_R3 take3). Window probed once for overflow
    # like TakeTpu's skew retry; row-gather remains the fallback.
    from dpu_olap_tpu.ops.take_pallas import (
        default_window_rows,
        take_sorted,
        takeable_sorted,
    )

    use_sorted = _on_tpu() and takeable_sorted(rows, ni)
    if use_sorted:
        twr = default_window_rows(rows, ni)
        while twr <= 4 * default_window_rows(rows, ni):
            ovf = take_sorted(rx_flat, idx, window_rows=twr)[1]
            if int(np.asarray(ovf)) == 0:
                break
            twr *= 2
        else:
            use_sorted = False
    details["take_sorted_stream"] = use_sorted

    if use_sorted:
        def take_step(c, tbl):
            out, f = take_sorted(tbl, c, window_rows=twr)
            return c ^ (out & jnp.uint32(1)).astype(jnp.int32) ^ f
    else:
        def take_step(c, tbl):
            out = take(tbl, c)
            return c ^ (out & jnp.uint32(1)).astype(jnp.int32)
    tsec = time_chained(take_step, idx, k=4, consts=(rx_flat,))
    details["take_rows_per_s"] = ni / tsec
    _log("writing results")

    out_path = os.environ.get(
        "BENCH_DETAILS_PATH",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"
        ),
    )
    with open(out_path, "w") as f:
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


def aggregate_samples(samples):
    """(median, min, spread%) of every numeric metric present in ALL
    samples. Spread = (max - min) / |median| * 100."""
    import statistics

    numeric = [
        k
        for k, v in samples[0].items()
        if isinstance(v, (int, float)) and not isinstance(v, bool)
        and all(
            isinstance(s.get(k), (int, float)) and not isinstance(s.get(k), bool)
            for s in samples
        )
    ]
    median = {k: statistics.median(s[k] for s in samples) for k in numeric}
    mn = {k: min(s[k] for s in samples) for k in numeric}
    spread = {
        k: (
            100.0 * (max(s[k] for s in samples) - mn[k]) / abs(median[k])
            if median[k]
            else 0.0
        )
        for k in numeric
    }
    return median, mn, spread


def run_parent():
    """Fork BENCH_REPS fresh worker processes (the baseline-isolation
    pattern: identical-code single samples spread 45% across round-4 runs)
    and report the MEDIAN; per-metric samples/median/min/spread go to
    BENCH_DETAILS.json. Reference protocol: --benchmark_repetitions=3
    (scripts/run-upmem-2048.sh:17)."""
    import subprocess

    reps = int(os.environ.get("BENCH_REPS", "3"))
    here = os.path.dirname(os.path.abspath(__file__))
    samples, skip_reason = [], None
    attempts = 0
    while len(samples) < reps and attempts < reps + 2:
        i = attempts
        attempts += 1
        path = f"/tmp/bench_worker_{os.getpid()}_{i}.json"
        env = dict(os.environ, BENCH_DETAILS_PATH=path)
        _log(f"worker {len(samples) + 1}/{reps} (attempt {i + 1})...")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env,
            stdout=subprocess.PIPE,
            text=True,
        )
        line = (p.stdout or "").strip().splitlines()
        parsed = None
        if line:
            try:
                parsed = json.loads(line[-1])
            except json.JSONDecodeError:
                parsed = None
        if p.returncode != 0 or parsed is None:
            _log(f"worker failed (rc={p.returncode}); retrying")
            continue
        if parsed.get("skipped"):
            skip_reason = parsed.get("reason")
            _log(f"worker skipped: {skip_reason}")
            continue
        try:
            with open(path) as f:
                samples.append(json.load(f))
            os.unlink(path)
        except (OSError, json.JSONDecodeError) as e:
            _log(f"worker details unreadable: {e}")

    if not samples:
        print(
            json.dumps(
                {
                    "metric": "join_rows_per_s",
                    "value": None,
                    "unit": "rows/s",
                    "vs_baseline": None,
                    "sf": int(os.environ.get("SF", "1")),
                    "skipped": True,
                    "reason": skip_reason or "all bench workers failed",
                }
            )
        )
        return

    median, mn, spread = aggregate_samples(samples)
    details = {
        "reps": len(samples),
        "devices": samples[0].get("devices"),
        "sf": samples[0].get("sf"),
        "rows": samples[0].get("rows"),
        "median": median,
        "min": mn,
        "spread_pct": {k: round(v, 2) for k, v in spread.items()},
        "samples": samples,
    }
    with open(os.path.join(here, "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=2)

    value = median["join_rows_per_s"]
    base = median.get("arrow_join_rows_per_s")
    _log(
        f"median of {len(samples)}: {value/1e6:.1f} Mrows/s "
        f"(spread {spread['join_rows_per_s']:.1f}%)"
    )
    print(
        json.dumps(
            {
                "metric": "join_rows_per_s",
                "value": value,
                "unit": "rows/s",
                "vs_baseline": (value / base) if base else None,
                "sf": samples[0].get("sf"),
                "samples": len(samples),
                "spread_pct": round(spread["join_rows_per_s"], 2),
            }
        )
    )


def main():
    if "--worker" in sys.argv:
        run_worker()
    else:
        run_parent()


if __name__ == "__main__":
    main()
