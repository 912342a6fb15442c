#!/usr/bin/env python
"""Phase attribution for the fused co-sort join (VERDICT item 7 groundwork).

Times progressively larger prefixes of join_shard_fused's pipeline on the
real TPU with chained-difference timing: concat+sort, +propagate, +masks
(= full join). Differences attribute ms to each phase.
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
from dpu_olap_tpu.generator import make_join_tables
from dpu_olap_tpu.ops.hashtable import EMPTY
from dpu_olap_tpu.ops.join import _fill_forward


def log(m):
    print(f"[phases] {m}", file=sys.stderr, flush=True)


def rehash(x):
    x = (x ^ jnp.uint32(61)) ^ (x >> jnp.uint32(16))
    x = x + (x << jnp.uint32(3))
    x = x ^ (x >> jnp.uint32(4))
    x = x * jnp.uint32(0x27D4EB2D)
    return x ^ (x >> jnp.uint32(15))


def main():
    rows = int(os.environ.get("ROWS", 1 << 21))
    left, right = make_join_tables(1, rows, rows)
    lf, ly = left[0]["fk"], left[0]["y"]
    rk, rx = right[0]["pk"], right[0]["x"]
    jax.block_until_ready((lf, ly, rk, rx))
    n_r = n_l = rows
    res = {}

    def phase_sort(c):
        keys = jnp.concatenate([rk, c])
        side = jnp.concatenate(
            [jnp.zeros((n_r,), jnp.int32), jnp.ones((n_l,), jnp.int32)]
        )
        merged = [jnp.concatenate([rx, ly])]
        out = jax.lax.sort([keys, side, *merged], num_keys=1)
        return rehash(out[0][:n_l])

    def phase_sort_prop(c):
        keys = jnp.concatenate([rk, c])
        side = jnp.concatenate(
            [jnp.zeros((n_r,), jnp.int32), jnp.ones((n_l,), jnp.int32)]
        )
        merged = [jnp.concatenate([rx, ly])]
        sk, sside, sm = jax.lax.sort([keys, side, *merged], num_keys=1)
        is_pk = sside == 0
        propagated = _fill_forward((jnp.where(is_pk, sk, EMPTY), sm))
        return rehash(sk[:n_l] ^ propagated[0][:n_l])

    def phase_full(c):
        from dpu_olap_tpu.ops.join import join_shard_fused

        fk, (y,), (x,), matched = join_shard_fused(c, (ly,), rk, (rx,))
        return rehash(fk[:n_l])

    k = int(os.environ.get("K", 4))
    for name, fn in [("sort", phase_sort), ("sort+prop", phase_sort_prop),
                     ("full", phase_full)]:
        sec = time_chained(fn, lf, k=k)
        res[name] = sec * 1e3
        log(f"{name}: {sec*1e3:.3f} ms")

    res["propagate_ms"] = res["sort+prop"] - res["sort"]
    res["mask_ms"] = res["full"] - res["sort+prop"]
    log(f"attribution: sort={res['sort']:.2f} propagate={res['propagate_ms']:.2f} "
        f"mask/where={res['mask_ms']:.2f}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
