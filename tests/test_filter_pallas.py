"""Pallas filter kernel tests (interpret mode on the CPU backend).

The butterfly concentration network's conflict-freedom (monotone routing)
is exercised with adversarial selectivity patterns plus randomized sweeps.
Real-TPU execution is covered by bench.py / scripts on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.filter_pallas import (
    filter_compact_pallas,
    filter_compact_pallas_clean,
)

BLK = 256 * 128  # default block = 32Ki elements


def run(v):
    out, cnt = filter_compact_pallas_clean(jnp.asarray(v), interpret=True)
    return np.asarray(out), int(cnt)


def check(v):
    out, cnt = run(v)
    expect = v[v < (1 << 30)]
    assert cnt == len(expect)
    np.testing.assert_array_equal(out[:cnt], expect)
    assert np.all(out[cnt:] == 0)


def test_random_one_block(rng):
    check(rng.integers(0, 2**32, BLK, dtype=np.uint32))


def test_random_multi_block(rng):
    check(rng.integers(0, 2**32, 4 * BLK, dtype=np.uint32))


PASS = np.uint32(1)
FAIL = np.uint32(1 << 31)


@pytest.mark.parametrize(
    "name",
    ["all", "none", "alternate", "first_half", "last_half", "single",
     "sparse", "dense", "block_edges"],
)
def test_adversarial_patterns(rng, name):
    n = 2 * BLK
    i = np.arange(n)
    if name == "all":
        v = np.full(n, PASS)
    elif name == "none":
        v = np.full(n, FAIL)
    elif name == "alternate":
        v = np.where(i % 2 == 0, PASS, FAIL)
    elif name == "first_half":
        v = np.where(i < n // 2, PASS, FAIL)
    elif name == "last_half":
        v = np.where(i >= n // 2, PASS, FAIL)
    elif name == "single":
        v = np.where(i == n - 5, PASS, FAIL)
    elif name == "sparse":
        v = np.where(rng.random(n) < 0.01, PASS, FAIL)
    elif name == "dense":
        v = np.where(rng.random(n) < 0.99, PASS, FAIL)
    elif name == "block_edges":
        # exactly one survivor at each block boundary lane
        v = np.full(n, FAIL)
        v[[0, BLK - 1, BLK, BLK + 1, 2 * BLK - 1]] = PASS
    v = np.ascontiguousarray(v.astype(np.uint32))
    # preserve original values' order: make them distinguishable
    v = v + (i % 128).astype(np.uint32)
    check(v)


def test_stability_preserves_order(rng):
    n = 2 * BLK
    v = rng.integers(0, 2**32, n, dtype=np.uint32)
    out, cnt = run(v)
    expect = v[v < (1 << 30)]
    np.testing.assert_array_equal(out[:cnt], expect)  # exact order


def test_with_indices_pallas(rng):
    from dpu_olap_tpu.ops.filter_pallas import filter_with_indices_pallas

    v = rng.integers(0, 2**32, 2 * BLK, dtype=np.uint32)
    vals, idxs, cnt = filter_with_indices_pallas(jnp.asarray(v), interpret=True)
    c = int(cnt)
    mask = v < (1 << 30)
    np.testing.assert_array_equal(np.asarray(idxs)[:c], np.flatnonzero(mask))
    np.testing.assert_array_equal(np.asarray(vals)[:c], v[mask])


def test_phase_crossings(rng):
    # counts that force every lane phase at block boundaries
    n = 4 * BLK
    v = np.full(n, FAIL, dtype=np.uint32)
    keep = rng.choice(n, size=3 * 128 + 37, replace=False)  # odd phase drift
    v[keep] = rng.integers(0, 1 << 30, len(keep), dtype=np.uint32)
    check(v)


@pytest.mark.parametrize(
    "name", ["all", "none", "alternate", "single", "sparse", "block_edges"]
)
def test_with_indices_adversarial(rng, name):
    # the packed-cargo routing (selection index in the distance word's low
    # 15 bits, run_butterfly dshift form) through the same torture patterns
    # as the value-only kernel
    from dpu_olap_tpu.ops.filter_pallas import filter_with_indices_pallas

    n = 2 * BLK
    i = np.arange(n)
    if name == "all":
        v = np.full(n, PASS)
    elif name == "none":
        v = np.full(n, FAIL)
    elif name == "alternate":
        v = np.where(i % 2 == 0, PASS, FAIL)
    elif name == "single":
        v = np.where(i == n - 5, PASS, FAIL)
    elif name == "sparse":
        v = np.where(rng.random(n) < 0.01, PASS, FAIL)
    elif name == "block_edges":
        v = np.full(n, FAIL)
        v[[0, BLK - 1, BLK, BLK + 1, 2 * BLK - 1]] = PASS
    v = np.ascontiguousarray((v + (i % 128)).astype(np.uint32))
    vals, idxs, cnt = filter_with_indices_pallas(jnp.asarray(v), interpret=True)
    c = int(cnt)
    mask = v < (1 << 30)
    np.testing.assert_array_equal(np.asarray(idxs)[:c], np.flatnonzero(mask))
    np.testing.assert_array_equal(np.asarray(vals)[:c], v[mask])
