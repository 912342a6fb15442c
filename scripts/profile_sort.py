#!/usr/bin/env python
"""Benchmark sort_bitonic (Pallas merge-tree sort) vs the flat XLA sort on
the real TPU. Chained-difference timing; all operands kept live.

ROWS=N (default 2Mi) PAYS=k (default 1) LEAF=8192 to override.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from dpu_olap_tpu.bench.device_time import time_chained
from dpu_olap_tpu.ops.sort_pallas import sort_bitonic


def log(m):
    print(f"[sort] {m}", file=sys.stderr, flush=True)


def rehash(x):
    x = (x ^ jnp.uint32(61)) ^ (x >> jnp.uint32(16))
    x = x + (x << jnp.uint32(3))
    return x * jnp.uint32(0x27D4EB2D)


def main():
    n = int(os.environ.get("ROWS", 1 << 21))
    n_pay = int(os.environ.get("PAYS", 1))
    leaf = int(os.environ.get("LEAF", 8192))
    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    pays = [
        jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
        for _ in range(n_pay)
    ]
    jax.block_until_ready((keys, *pays))
    res = {"n": n, "n_pay": n_pay, "leaf": leaf}

    # correctness first (one real run, device-side check to avoid readback)
    out = sort_bitonic((keys, *pays), leaf=leaf)
    ok_sorted = bool(jnp.all(out[0][1:] >= out[0][:-1]))
    # keys multiset preserved: compare sorted reference on device
    ref = jax.lax.sort([keys] + list(pays), num_keys=1)
    ok_keys = bool(jnp.all(out[0] == ref[0]))
    res["correct"] = ok_sorted and ok_keys
    log(f"correct: sorted={ok_sorted} keys-match={ok_keys}")
    if not res["correct"]:
        print(json.dumps(res))
        return

    def flat(c):
        outs = jax.lax.sort([c] + list(pays), num_keys=1)
        acc = outs[0]
        for o in outs[1:]:
            acc = acc ^ o
        return rehash(acc)

    def tree(c):
        outs = sort_bitonic((c, *pays), leaf=leaf)
        acc = outs[0]
        for o in outs[1:]:
            acc = acc ^ o
        return rehash(acc)

    log("timing flat XLA sort...")
    res["flat_ms"] = time_chained(flat, keys, k=2) * 1e3
    log(f"flat {res['flat_ms']:.3f} ms; timing sort_bitonic...")
    res["tree_ms"] = time_chained(tree, keys, k=2) * 1e3
    log(f"tree {res['tree_ms']:.3f} ms")
    res["speedup"] = res["flat_ms"] / res["tree_ms"]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
