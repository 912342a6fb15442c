"""Streaming merge-probe kernel + merge join tests (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.merge_pallas import merge_probe_pallas

R = 16  # small blocks in tests: more boundary crossings per input
BLK = R * 128


def oracle(left, right, pay):
    idx = np.searchsorted(right, left, side="right") - 1
    has = idx >= 0
    safe = np.clip(idx, 0, None)
    return has, right[safe].astype(np.uint32), pay[safe].astype(np.uint32)


def check(rng, nl, nr, key_hi=2**31):
    right = np.sort(rng.choice(key_hi, size=nr, replace=False).astype(np.uint32))
    pay = rng.integers(0, 2**32, nr, dtype=np.uint32)
    left = np.sort(rng.integers(0, key_hi, nl).astype(np.uint32))
    has, pk, (pp,) = merge_probe_pallas(
        jnp.asarray(left), jnp.asarray(right), (jnp.asarray(pay),),
        block_rows=R, interpret=True,
    )
    eh, ek, ep = oracle(left, right, pay)
    np.testing.assert_array_equal(np.asarray(has), eh)
    np.testing.assert_array_equal(np.asarray(pk)[eh], ek[eh])
    np.testing.assert_array_equal(np.asarray(pp)[eh], ep[eh])


@pytest.mark.parametrize(
    "nl,nr",
    [(BLK, BLK), (2 * BLK, BLK), (BLK, 2 * BLK), (4 * BLK, 4 * BLK),
     (3 * BLK - 77, 2 * BLK - 13)],  # ragged -> padding paths
)
def test_merge_probe_shapes(rng, nl, nr):
    check(rng, nl, nr)


def test_merge_probe_exact_matches(rng):
    right = np.sort(rng.choice(2**31, size=2 * BLK, replace=False).astype(np.uint32))
    pay = rng.integers(0, 2**32, 2 * BLK, dtype=np.uint32)
    left = np.sort(right[rng.integers(0, 2 * BLK, 4 * BLK)])
    has, pk, (pp,) = merge_probe_pallas(
        jnp.asarray(left), jnp.asarray(right), (jnp.asarray(pay),),
        block_rows=R, interpret=True,
    )
    assert (np.asarray(pk) == left).all()  # every probe key present


def test_merge_probe_all_below(rng):
    # probes below every build key -> has all-False
    right = np.arange(1000, 1000 + BLK, dtype=np.uint32)
    left = np.arange(BLK, dtype=np.uint32)  # 0..BLK-1 < 1000 for first 1000
    has, pk, _ = merge_probe_pallas(
        jnp.asarray(left), jnp.asarray(right), (jnp.asarray(right),),
        block_rows=R, interpret=True,
    )
    assert not np.asarray(has)[:1000].any()


def test_join_shard_merge_differential(rng):
    from dpu_olap_tpu.ops.join import join_shard_merge

    n = 2 * BLK
    pk = np.arange(n, dtype=np.uint32)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    fk = rng.integers(0, n, n).astype(np.uint32)
    y = rng.integers(0, 2**32, n, dtype=np.uint32)
    # interpret path: call via the kernel's interpret flag by running the
    # pieces manually (join_shard_merge itself is TPU-targeted; on CPU the
    # pallas_call inside would try to compile) — emulate with interpret mode
    sorted_l = jax.lax.sort([jnp.asarray(fk), jnp.asarray(y)], num_keys=1)
    has, pkey, (px,) = merge_probe_pallas(
        sorted_l[0], jnp.asarray(pk), (jnp.asarray(x),), block_rows=R, interpret=True
    )
    matched = np.asarray(has) & (np.asarray(pkey) == np.asarray(sorted_l[0]))
    assert matched.all()
    np.testing.assert_array_equal(np.asarray(px), x[np.asarray(sorted_l[0])])
