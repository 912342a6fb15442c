"""Tests for the v3 (two-stage split network) filter compaction kernel.

Both butterflies' conflict-freedom and the rotation/phase algebra are
exercised with the same adversarial selectivity patterns as v1
(test_filter_pallas.py), plus phase-crossing sweeps; interpret mode is the
simulator tier, Mosaic lowering is pinned in test_tpu_lowering.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.filter_pallas3 import (
    filter_compact_pallas3,
    filter_with_indices_pallas3,
)

BLK = 256 * 128
THR = 1 << 30
PASS = np.uint32(1)
FAIL = np.uint32(1 << 31)


def check(v, block_rows=256):
    v = np.ascontiguousarray(v.astype(np.uint32))
    out, cnt = filter_compact_pallas3(
        jnp.asarray(v), block_rows=block_rows, interpret=True
    )
    out, cnt = np.asarray(out), int(cnt)
    expect = v[v < THR]
    assert cnt == len(expect)
    np.testing.assert_array_equal(out[:cnt], expect)
    o2, s2, c2 = filter_with_indices_pallas3(
        jnp.asarray(v), block_rows=block_rows, interpret=True
    )
    assert int(c2) == cnt
    np.testing.assert_array_equal(np.asarray(o2)[:cnt], expect)
    np.testing.assert_array_equal(
        np.asarray(s2)[:cnt], np.flatnonzero(v < THR)
    )


def test_random_one_block(rng):
    check(rng.integers(0, 2**32, BLK, dtype=np.uint32))


def test_random_multi_block(rng):
    check(rng.integers(0, 2**32, 4 * BLK, dtype=np.uint32))


@pytest.mark.parametrize(
    "name",
    ["all", "none", "alternate", "first_half", "last_half", "single",
     "sparse", "dense", "block_edges", "row_edges"],
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
        v = np.full(n, FAIL)
        v[[0, BLK - 1, BLK, BLK + 1, 2 * BLK - 1]] = PASS
    elif name == "row_edges":
        # lane-0/lane-127 survivors stress the rotation wrap (t < phi)
        v = np.full(n, FAIL)
        v[i % 128 == 0] = PASS
        v[i % 128 == 127] = PASS
    v = v + (i % 128).astype(np.uint32)
    check(v)


def test_phase_sweep_small_blocks(rng):
    # drive the carry/rotation through many distinct phases with r=8 blocks
    n = 16 * 8 * 128
    v = np.where(rng.random(n) < 0.37, PASS, FAIL) + (
        np.arange(n) % 128
    ).astype(np.uint32)
    check(v, block_rows=8)


def test_stability_preserves_order(rng):
    n = 2 * BLK
    v = rng.integers(0, 2**32, n, dtype=np.uint32)
    out, cnt = filter_compact_pallas3(jnp.asarray(v), interpret=True)
    expect = v[v < THR]
    np.testing.assert_array_equal(np.asarray(out)[: int(cnt)], expect)


def test_block_rows_512_compact(rng):
    # compact blocks may run at r=512 (no cargo bits to overflow)
    n = 512 * 128 * 2
    v = rng.integers(0, 2**32, n, dtype=np.uint32)
    out, cnt = filter_compact_pallas3(
        jnp.asarray(v), block_rows=512, interpret=True
    )
    expect = v[v < THR]
    assert int(cnt) == len(expect)
    np.testing.assert_array_equal(np.asarray(out)[: int(cnt)], expect)


def test_with_indices_block_rows_clamped(rng):
    # with_indices at block_rows=512 must clamp to 256 (15-bit flat cargo)
    n = 512 * 128 * 2
    v = rng.integers(0, 2**32, n, dtype=np.uint32)
    o, s, c = filter_with_indices_pallas3(
        jnp.asarray(v), block_rows=512, interpret=True
    )
    expect = v[v < THR]
    assert int(c) == len(expect)
    np.testing.assert_array_equal(np.asarray(o)[: int(c)], expect)
    np.testing.assert_array_equal(
        np.asarray(s)[: int(c)], np.flatnonzero(v < THR)
    )
