#!/usr/bin/env python
"""Microbenchmark kernel variants on the ambient platform (the real chip).

Isolates which XLA lowerings are fast/slow on TPU v5e so the default
kernel impls can be chosen from measurement, not guesswork.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[len(times) // 2] * 1e3
    print(f"{name:45s} {ms:10.3f} ms")
    return ms


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(42)
    n = 1 << 23  # 8Mi rows, 32MB
    x = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    xf = jnp.asarray(rng.random(n, dtype=np.float32))
    jax.block_until_ready((x, xf))

    print("\n-- baseline / calibration --")
    timeit("noop (dispatch+sync latency)", lambda a: a, jnp.zeros((8, 128)))
    timeit("copy f32 8Mi (x+1)", lambda a: a + 1.0, xf)
    timeit("copy u32 8Mi (x+1)", lambda a: a + 1, x)

    print("\n-- sum variants (8Mi) --")
    timeit("jnp.sum f32", lambda a: jnp.sum(a), xf)
    timeit("jnp.sum u32 (wrap)", lambda a: jnp.sum(a), x)
    timeit("jnp.sum i32", lambda a: jnp.sum(a.astype(jnp.int32)), x)
    timeit("2-stage sum u32 (resh 4096)", lambda a: jnp.sum(jnp.sum(a.reshape(-1, 4096), axis=1)), x)
    from dpu_olap_tpu.ops.aggregate import sum_u64_pair

    timeit("sum_u64_pair (exact)", sum_u64_pair, x)

    print("\n-- filter variants (8Mi) --")
    from dpu_olap_tpu.ops.filter import filter_compact

    timeit("mask+count only", lambda a: jnp.sum(a < (1 << 30)), x)
    timeit("cumsum i32 8Mi", lambda a: jnp.cumsum((a < (1 << 30)).astype(jnp.int32)), x)
    timeit("filter scatter impl", lambda a: filter_compact(a, impl="scatter"), x)
    timeit("filter sort impl", lambda a: filter_compact(a, impl="sort"), x)
    timeit("argsort u32 8Mi", lambda a: jnp.argsort(a), x)
    timeit("sort u32 8Mi", lambda a: jnp.sort(a), x)

    print("\n-- take variants (2Mi data, 512Ki idx) --")
    nd, ni = 1 << 21, 1 << 19
    data = jnp.asarray(rng.integers(0, 2**32, nd, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, nd, ni, dtype=np.uint32))
    idx32 = idx.astype(jnp.int32)
    jax.block_until_ready((data, idx32))
    timeit("jnp.take mode=clip", lambda d, i: jnp.take(d, i, mode="clip"), data, idx32)
    timeit("jnp.take mode=fill", lambda d, i: jnp.take(d, i, mode="fill", fill_value=0), data, idx32)
    timeit("d[i] fancy", lambda d, i: d[i], data, idx32)
    timeit("gather 2d rows (n,1)", lambda d, i: d.reshape(-1, 1)[i, 0], data, idx32)
    timeit(
        "onehot-free sort-gather",
        lambda d, i: jnp.take(d, jnp.sort(i), mode="clip"),
        data,
        idx32,
    )

    print("\n-- scatter variants (2Mi) --")
    vals = jnp.asarray(rng.integers(0, 2**32, ni, dtype=np.uint32))
    timeit(
        "scatter set 512Ki->2Mi",
        lambda d, i, v: d.at[i].set(v, mode="drop", unique_indices=True),
        data, idx32, vals,
    )
    timeit(
        "scatter add 512Ki->2Mi",
        lambda d, i, v: d.at[i].add(v, mode="drop"),
        data, idx32, vals,
    )

    print("\n-- partition/sort variants (4Mi) --")
    n4 = 1 << 22
    k4 = jnp.asarray(rng.integers(0, 2**32, n4, dtype=np.uint32))
    from dpu_olap_tpu.ops.partition import radix_partition

    timeit("radix_partition P=8", lambda a: radix_partition(a, 8), k4)
    timeit("argsort 8-bucket key", lambda a: jnp.argsort(a >> 29, stable=True), k4)

    print("\n-- cuckoo join (2Mi x 2Mi) --")
    from dpu_olap_tpu.ops.join import join_shard

    pk = jnp.asarray(rng.permutation(n // 4).astype(np.uint32))[: 1 << 21]
    pkx = jnp.asarray(rng.integers(0, 2**32, 1 << 21, dtype=np.uint32))
    fk = jnp.take(pk, jnp.asarray(rng.integers(0, 1 << 21, 1 << 21, dtype=np.uint32)).astype(jnp.int32))
    fy = jnp.asarray(rng.integers(0, 2**32, 1 << 21, dtype=np.uint32))
    jax.block_until_ready((pk, pkx, fk, fy))
    timeit("join_shard cuckoo", lambda a, b, c, d: join_shard(a, (b,), c, (d,), impl="cuckoo"), fk, fy, pk, pkx)
    timeit("join_shard sort", lambda a, b, c, d: join_shard(a, (b,), c, (d,), impl="sort"), fk, fy, pk, pkx)


if __name__ == "__main__":
    main()
