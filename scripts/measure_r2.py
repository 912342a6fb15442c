#!/usr/bin/env python
"""Round-2 measurement campaign (real TPU via tunnel).

Decides the join/take redesign:
  sort.*        XLA sort cost vs length, operand count, and batching
  rowgather.*   jnp.take of 128-wide rows + lane-extract fusion (the probe /
                fast-take primitive candidate)
  misc.*        dynamic roll etc.

Usage: python scripts/measure_r2.py [--filter REGEX]
Writes MEASURE_R2.json at the repo root (merged with any existing content).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from dpu_olap_tpu.bench.device_time import time_chained

OUT = Path(__file__).resolve().parents[1] / "MEASURE_R2.json"
results: dict = {}
if OUT.exists():
    results = json.loads(OUT.read_text())


def log(msg):
    print(f"[measure] {msg}", file=sys.stderr, flush=True)


def record(name, sec, items):
    results[name] = {
        "ms": sec * 1e3,
        "items_per_s": items / sec,
        "gb_per_s": items * 4 / sec / 1e9,
    }
    log(f"{name}: {sec*1e3:.3f} ms  {items/sec/1e6:.1f} M/s")
    OUT.write_text(json.dumps(results, indent=2))


def rand_u32(n, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 2**32, n, dtype=np.uint32)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", default=".*")
    ap.add_argument("-k", type=int, default=4)
    args = ap.parse_args()
    pat = re.compile(args.filter)
    k = args.k
    log(f"devices: {jax.devices()}")

    # ---- sort scaling --------------------------------------------------
    # Chain perturbation is a wang-style rehash so every iteration sorts
    # fresh uniform data (a ^1 perturbation leaves rows nearly sorted and
    # lets any adaptivity in the lowering flatter the numbers).
    def rehash(x):
        x = (x ^ jnp.uint32(61)) ^ (x >> jnp.uint32(16))
        x = x + (x << jnp.uint32(3))
        x = x ^ (x >> jnp.uint32(4))
        x = x * jnp.uint32(0x27D4EB2D)
        return x ^ (x >> jnp.uint32(15))

    def sort_case(name, n_total, batch, nops):
        if not pat.search(name):
            return
        rows = n_total // batch
        shape = (rows,) if batch == 1 else (batch, rows)
        key = rand_u32(n_total).reshape(shape)
        ops = [
            rand_u32(n_total, seed=i + 1).reshape(shape) for i in range(nops - 1)
        ]
        jax.block_until_ready((key, ops))

        def step(c):
            out = jax.lax.sort([c] + ops, num_keys=1, dimension=-1)
            return rehash(out[0])

        sec = time_chained(step, key, k=k)
        record(name, sec, n_total)

    for nops in (1, 2, 3, 4):
        sort_case(f"sort.4Mi_b1_ops{nops}", 1 << 22, 1, nops)
    sort_case("sort.2Mi_b1_ops2", 1 << 21, 1, 2)
    for batch in (16, 64, 256, 1024):
        sort_case(f"sort.4Mi_b{batch}_ops3", 1 << 22, batch, 3)
    for batch in (16, 256):
        sort_case(f"sort.2Mi_b{batch}_ops2", 1 << 21, batch, 2)

    # ---- row-gather probe primitive -----------------------------------
    # table (B,128) uint32; idx (n,) int32; gather rows then extract one lane
    # per row via onehot-multiply + row-sum (what a bucket-hash probe or a
    # fast take does). Measures whether XLA fuses extract into the gather.
    def rowgather_case(name, b_rows, n_idx, extract):
        if not pat.search(name):
            return
        table = rand_u32(b_rows * 128).reshape(b_rows, 128)
        idx = jnp.asarray(
            np.random.default_rng(7).integers(0, b_rows, n_idx, dtype=np.int32)
        )
        lane = jnp.asarray(
            np.random.default_rng(8).integers(0, 128, n_idx, dtype=np.int32)
        )
        jax.block_until_ready((table, idx, lane))

        if extract == "none":
            def step(c):
                rows = jnp.take(table, c, axis=0)  # (n,128)
                return c ^ (rows[:, 0] & jnp.uint32(1)).astype(jnp.int32)
        elif extract == "onehot":
            def step(c):
                rows = jnp.take(table, c, axis=0)
                oh = (
                    jax.lax.broadcasted_iota(jnp.int32, (n_idx, 128), 1)
                    == lane[:, None]
                )
                vals = jnp.sum(jnp.where(oh, rows, 0), axis=1)
                return c ^ (vals & jnp.uint32(1)).astype(jnp.int32)
        elif extract == "takealong":
            def step(c):
                rows = jnp.take(table, c, axis=0)
                vals = jnp.take_along_axis(rows, lane[:, None], axis=1)[:, 0]
                return c ^ (vals & jnp.uint32(1)).astype(jnp.int32)

        sec = time_chained(step, idx, k=k)
        record(name, sec, n_idx)

    rowgather_case("rowgather.32Ki_2Mi_none", 1 << 15, 1 << 21, "none")
    rowgather_case("rowgather.32Ki_2Mi_onehot", 1 << 15, 1 << 21, "onehot")
    rowgather_case("rowgather.32Ki_2Mi_takealong", 1 << 15, 1 << 21, "takealong")
    rowgather_case("rowgather.32Ki_512Ki_onehot", 1 << 15, 1 << 19, "onehot")
    rowgather_case("rowgather.4Ki_2Mi_onehot", 1 << 12, 1 << 21, "onehot")
    rowgather_case("rowgather.256Ki_2Mi_onehot", 1 << 18, 1 << 21, "onehot")

    # baseline element-gather for contrast
    if pat.search("gather.1d_2Mi"):
        data = rand_u32(1 << 21)
        idx = jnp.asarray(
            np.random.default_rng(7).integers(0, 1 << 21, 1 << 21, dtype=np.int32)
        )
        jax.block_until_ready((data, idx))

        def step(c):
            return c ^ (jnp.take(data, c) & jnp.uint32(1)).astype(jnp.int32)

        record("gather.1d_2Mi", time_chained(step, idx, k=k), 1 << 21)

    # ---- probe composite: dense-table probe (gather+compare+extract) ----
    # Simulates bucket-hash probe: interleaved (B,128) row = 64 keys + 64
    # payloads; extract matching payload + found flag.
    if pat.search("probe.bucket64_2Mi"):
        b_rows = 1 << 16  # 64Ki buckets, 64-key cap
        n_idx = 1 << 21
        keys = rand_u32(b_rows * 64).reshape(b_rows, 64)
        pays = rand_u32(b_rows * 64, seed=3).reshape(b_rows, 64)
        table = jnp.concatenate([keys, pays], axis=1)  # (B,128)
        probes = rand_u32(n_idx, seed=5)
        bucket = jnp.asarray(
            np.random.default_rng(9).integers(0, b_rows, n_idx, dtype=np.int32)
        )
        jax.block_until_ready((table, probes, bucket))

        def step(c):
            rows = jnp.take(table, c, axis=0)  # (n,128)
            rk = rows[:, :64]
            rp = rows[:, 64:]
            eq = rk == probes[:, None]
            val = jnp.sum(jnp.where(eq, rp, 0), axis=1)
            found = jnp.any(eq, axis=1)
            return c ^ (val & jnp.uint32(1)).astype(jnp.int32) ^ found.astype(jnp.int32)

        record("probe.bucket64_2Mi", time_chained(step, bucket, k=k), n_idx)

    # ---- misc ----------------------------------------------------------
    if pat.search("misc.copy_8Mi"):
        x = rand_u32(1 << 23)
        jax.block_until_ready(x)
        record("misc.copy_8Mi", time_chained(lambda c: c ^ jnp.uint32(1), x, k=64), 1 << 23)

    log("done")


if __name__ == "__main__":
    main()
