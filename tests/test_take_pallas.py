"""Differential tests for the sorted-stream take kernel (take_pallas).

Mirrors the reference's take differential strategy (take_test.cc:24-72):
random seeded inputs, exact equality vs the numpy oracle; interpret-mode
Pallas is the simulator tier (SURVEY.md §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.take_pallas import (
    gather_sorted_pallas,
    take_sorted,
    takeable_sorted,
)


def test_gather_sorted_uniform(rng):
    n, k = 16 << 10, 4 << 10
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    sidx = np.sort(rng.integers(0, n, k, dtype=np.uint32))
    val, flag = gather_sorted_pallas(
        jnp.asarray(data), jnp.asarray(sidx), interpret=True
    )
    assert int(flag) == 0
    np.testing.assert_array_equal(np.asarray(val), data[sidx])


def test_gather_sorted_duplicates_and_gaps(rng):
    n, k = 8 << 10, 2 << 10
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    # heavy duplication + whole slices with no queries
    raw = rng.integers(0, n // 4, k, dtype=np.uint32)
    sidx = np.sort(np.where(raw % 3 == 0, raw % 7, raw))
    val, flag = gather_sorted_pallas(
        jnp.asarray(data), jnp.asarray(sidx), window_rows=32, interpret=True
    )
    assert int(flag) == 0
    np.testing.assert_array_equal(np.asarray(val), data[sidx])


@pytest.mark.parametrize("sr,wr", [(8, 8), (16, 8), (16, 16), (64, 32)])
def test_gather_sorted_slice_geometries(rng, sr, wr):
    # the slice/window sweep candidates (select work ~ k*slack*slice_rows)
    n, k = 32 << 10, 8 << 10
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    sidx = np.sort(rng.integers(0, n, k, dtype=np.uint32))
    val, flag = gather_sorted_pallas(
        jnp.asarray(data), jnp.asarray(sidx),
        slice_rows=sr, window_rows=wr, interpret=True,
    )
    assert int(flag) == 0
    np.testing.assert_array_equal(np.asarray(val), data[sidx])


def test_take_sorted_uniform(rng):
    n, k = 64 << 10, 16 << 10
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    idx = rng.integers(0, n, k, dtype=np.uint32)
    out, flag = take_sorted(jnp.asarray(data), jnp.asarray(idx), interpret=True)
    assert int(flag) == 0
    np.testing.assert_array_equal(np.asarray(out), data[idx])


def test_take_sorted_nonmultiple_length(rng):
    n = 64 << 10
    k = (16 << 10) - 37
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    idx = rng.integers(0, n, k, dtype=np.uint32)
    out, flag = take_sorted(jnp.asarray(data), jnp.asarray(idx), interpret=True)
    assert int(flag) == 0
    np.testing.assert_array_equal(np.asarray(out), data[idx])


def test_take_sorted_float_payload(rng):
    n, k = 64 << 10, 16 << 10
    data = rng.standard_normal(n).astype(np.float32)
    idx = rng.integers(0, n, k, dtype=np.uint32)
    out, flag = take_sorted(jnp.asarray(data), jnp.asarray(idx), interpret=True)
    assert int(flag) == 0
    np.testing.assert_array_equal(np.asarray(out), data[idx])


def test_take_sorted_overflow_flag_and_retry(rng):
    """Clustered indices overflow a small window (flag set, results
    untrusted); the doubled window clears the flag — the TakeTpu retry."""
    n, k = 64 << 10, 16 << 10
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    idx = rng.integers(0, n, k, dtype=np.uint32)
    idx[: k // 3] = idx[0]  # one position hit k/3 times
    _, flag = take_sorted(
        jnp.asarray(data), jnp.asarray(idx), window_rows=8, interpret=True
    )
    assert int(flag) != 0
    out, flag2 = take_sorted(
        jnp.asarray(data), jnp.asarray(idx), window_rows=64, interpret=True
    )
    assert int(flag2) == 0
    np.testing.assert_array_equal(np.asarray(out), data[idx])


def test_take_sorted_clip_semantics(rng):
    n, k = 64 << 10, 16 << 10
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    idx = rng.integers(0, n, k, dtype=np.uint32)
    idx[::7] = n + rng.integers(0, 1000, len(idx[::7])).astype(np.uint32)
    out, flag = take_sorted(
        jnp.asarray(data), jnp.asarray(idx), window_rows=64, interpret=True
    )
    assert int(flag) == 0
    np.testing.assert_array_equal(np.asarray(out), data[np.minimum(idx, n - 1)])


@pytest.mark.parametrize(
    "n,k,ok",
    [(4 << 20, 512 << 10, True), (4 << 20, 4 << 10, False), (100, 16 << 10, False)],
)
def test_takeable_gate(n, k, ok):
    assert takeable_sorted(n, k) == ok


def test_take_fast_interpret_matches_oracle(rng):
    from dpu_olap_tpu.ops.take import take_fast

    n, k = 1 << 14, 1 << 13
    data = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n, k, dtype=np.uint32))
    out = take_fast(data, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(data)[np.asarray(idx)]
    )


def test_take_fast_adversarial_clustering_retries(rng):
    # all indices in one table slice: the default window overflows and the
    # doubling retry (or row-gather fallback) must still return exact results
    from dpu_olap_tpu.ops.take import take_fast

    n, k = 1 << 14, 1 << 13
    data = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, 64, k, dtype=np.uint32))
    out = take_fast(data, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(data)[np.asarray(idx)]
    )


def test_take_sorted_nonpow2_padded_k(rng):
    # Round-3 review regression: k whose 128-padded size is NOT a power of
    # two used to leak sort-internal pad payloads (pos 0) into the restore
    # sort, shifting nearly every output element while reporting flag=0.
    n = 64 << 10
    for k in (10_000, 9_001):
        data = rng.integers(0, 2**32, n, dtype=np.uint32)
        idx = rng.integers(0, n, k, dtype=np.uint32)
        out, flag = take_sorted(
            jnp.asarray(data), jnp.asarray(idx), window_rows=64, interpret=True
        )
        assert int(flag) == 0
        np.testing.assert_array_equal(np.asarray(out), data[idx])


def test_take_sorted_stream_orderfree(rng):
    from dpu_olap_tpu.ops.take_pallas import take_sorted_stream

    n, k = 64 << 10, 16 << 10
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    idx = rng.integers(0, n, k, dtype=np.uint32)
    pos, val, flag = take_sorted_stream(
        jnp.asarray(data), jnp.asarray(idx), interpret=True
    )
    assert int(flag) == 0
    pos, val = np.asarray(pos), np.asarray(val)
    assert pos.shape == val.shape == (k,)
    # pos is a permutation of 0..k-1 and the scatter reconstructs the
    # ordered take exactly
    assert np.array_equal(np.sort(pos), np.arange(k, dtype=np.uint32))
    out = np.zeros(k, np.uint32)
    out[pos] = val
    np.testing.assert_array_equal(out, data[idx])
    # the stream itself is in ascending-index order
    np.testing.assert_array_equal(val, data[np.sort(idx)])


def test_take_sorted_stream_nonpow2_and_clip(rng):
    from dpu_olap_tpu.ops.take_pallas import take_sorted_stream

    n, k = 32 << 10, 9_001
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    idx = rng.integers(0, n, k, dtype=np.uint32)
    idx[rng.choice(k, 50, replace=False)] = 0xFFFFFFF0  # out of range -> clip
    pos, val, flag = take_sorted_stream(
        jnp.asarray(data), jnp.asarray(idx), interpret=True
    )
    assert int(flag) == 0
    pos, val = np.asarray(pos), np.asarray(val)
    assert pos.shape == val.shape == (k,)
    assert np.array_equal(np.sort(pos), np.arange(k, dtype=np.uint32))
    out = np.zeros(k, np.uint32)
    out[pos] = val
    np.testing.assert_array_equal(out, data[np.minimum(idx, n - 1)])
