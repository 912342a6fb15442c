#!/usr/bin/env python
"""Phase attribution for the sorted-build join's bitonic merge + probe sort.

Measures on the real TPU (chained-difference timing):
  - probe-sort candidates: u32 2-op flat sort, u64 packed 1-op sort
  - full bitonic_merge (key + 1 payload plane, 4Mi)
  - the XLA big-d stage prefix alone
  - bitonic_merge_blocks alone (block cascade), at several block_rows

Drives the VERDICT round-2 item 1 follow-up: which merge formulation wins.
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


def log(m):
    print(f"[merge] {m}", file=sys.stderr, flush=True)


def rehash(x):
    x = (x ^ jnp.uint32(61)) ^ (x >> jnp.uint32(16))
    x = x + (x << jnp.uint32(3))
    return x * jnp.uint32(0x27D4EB2D)


def main():
    n = int(os.environ.get("ROWS", 1 << 21))  # per side
    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.uint32))
    pay = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    pk = jnp.asarray(np.arange(n, dtype=np.uint32))
    px = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    jax.block_until_ready((keys, pay, pk, px))
    res = {"n_per_side": n}

    # --- probe sort: u32 2-op flat ---
    def sort2(c):
        out = jax.lax.sort([c, pay], num_keys=1)
        return rehash(out[0] ^ out[1])

    res["sort_u32_2op_ms"] = time_chained(sort2, keys, k=8) * 1e3
    log(f"u32 2-op flat sort: {res['sort_u32_2op_ms']:.3f} ms")

    # --- probe sort: u64 packed 1-op ---
    def sort64(c):
        packed = (c.astype(jnp.uint64) << jnp.uint64(32)) | pay.astype(jnp.uint64)
        out = jax.lax.sort([packed], num_keys=1)[0]
        return rehash(
            (out >> jnp.uint64(32)).astype(jnp.uint32)
            ^ out.astype(jnp.uint32)
        )

    try:
        res["sort_u64_1op_ms"] = time_chained(sort64, keys, k=8) * 1e3
        log(f"u64 packed 1-op sort: {res['sort_u64_1op_ms']:.3f} ms")
    except Exception as e:  # u64 sort may be unsupported/slow to compile
        log(f"u64 sort failed: {e}")

    # --- batched row sort (what XLA can do when order only matters per-row) ---
    def sortb(c):
        out = jax.lax.sort(
            [c.reshape(256, -1), pay.reshape(256, -1)], dimension=1, num_keys=1
        )
        return rehash(out[0] ^ out[1]).reshape(-1)

    res["sort_u32_2op_batched256_ms"] = time_chained(sortb, keys, k=8) * 1e3
    log(f"u32 2-op batched(256,·): {res['sort_u32_2op_batched256_ms']:.3f} ms")

    # --- merge inputs: sorted probe + sorted pk, bitonic-arranged ---
    sk, sp = jax.lax.sort([keys, pay], num_keys=1)
    zk = jnp.concatenate([pk, sk[::-1]])
    zp = jnp.concatenate([px, sp[::-1]])
    jax.block_until_ready((zk, zp))

    from dpu_olap_tpu.ops.merge_xla import bitonic_merge
    from dpu_olap_tpu.ops.bitonic_pallas import bitonic_merge_blocks, DEF_R, LANES

    def full_merge(c):
        out = bitonic_merge((c, zp))
        return rehash(out[0] ^ out[1])

    res["merge_full_ms"] = time_chained(full_merge, zk, k=8) * 1e3
    log(f"full bitonic_merge 2-plane {2 * n}: {res['merge_full_ms']:.3f} ms")

    # --- XLA big-d stages alone ---
    def xla_stages(c):
        planes = [c, zp]
        nn = 2 * n
        block = DEF_R * LANES
        d = nn // 2
        while d >= block:
            shaped = [p.reshape(-1, 2 * d) for p in planes]
            lo_k, hi_k = shaped[0][:, :d], shaped[0][:, d:]
            m = lo_k <= hi_k
            out = []
            for p in shaped:
                lo, hi = p[:, :d], p[:, d:]
                nlo = jnp.where(m, lo, hi)
                nhi = jnp.where(m, hi, lo)
                out.append(jnp.concatenate([nlo, nhi], axis=1).reshape(nn))
            planes = out
            d //= 2
        return rehash(planes[0] ^ planes[1])

    res["merge_xla_stages_ms"] = time_chained(xla_stages, zk, k=8) * 1e3
    log(f"XLA big-d stages: {res['merge_xla_stages_ms']:.3f} ms")

    # --- block cascade alone, block_rows variants ---
    for r in (256, 512, 1024):
        def blocks(c, r=r):
            out = bitonic_merge_blocks((c, zp), block_rows=r)
            return rehash(out[0] ^ out[1])

        key = f"merge_blocks_r{r}_ms"
        res[key] = time_chained(blocks, zk, k=8) * 1e3
        log(f"block cascade r={r}: {res[key]:.3f} ms")

    out = Path(__file__).resolve().parents[1] / "MEASURE_MERGE.json"
    out.write_text(json.dumps(res, indent=2) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
