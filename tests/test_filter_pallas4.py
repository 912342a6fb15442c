"""Tests for the v4 (MXU-routed row phase) filter compaction kernel.

The closed-form inverse map (sr via counting matmuls), the spill-row
last-run identity, the inter-tile register carry (halves > 1), and the
cross-block carry algebra are exercised with the same adversarial
selectivity patterns as v1/v3, plus phase-crossing sweeps and a
spill-heavy pattern (near-all-pass drives phase + cnt past 16384 every
tile). Interpret mode is the simulator tier; Mosaic lowering is pinned in
test_tpu_lowering.py; on-device parity runs at the top of
scripts/measure_filter.py measure_v4.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.filter_pallas4 import (
    filter_compact_pallas4,
    filter_pallas4_padded,
    filter_with_indices_pallas4,
)

TILE = 128 * 128
BLK = 4 * TILE  # default halves=4 grid block
THR = 1 << 30
PASS = np.uint32(1)
FAIL = np.uint32(1 << 31)


def check(v, halves=4):
    v = np.ascontiguousarray(v.astype(np.uint32))
    out, cnt = filter_compact_pallas4(
        jnp.asarray(v), halves=halves, interpret=True
    )
    out, cnt = np.asarray(out), int(cnt)
    expect = v[v < THR]
    assert cnt == len(expect)
    np.testing.assert_array_equal(out[:cnt], expect)
    o2, s2, c2 = filter_with_indices_pallas4(
        jnp.asarray(v), halves=halves, interpret=True
    )
    assert int(c2) == cnt
    np.testing.assert_array_equal(np.asarray(o2)[:cnt], expect)
    np.testing.assert_array_equal(
        np.asarray(s2)[:cnt], np.flatnonzero(v < THR)
    )


@pytest.mark.parametrize("halves", [1, 2, 4])
def test_random_multi_block(rng, halves):
    check(rng.integers(0, 2**32, 2 * BLK, dtype=np.uint32), halves=halves)


@pytest.mark.parametrize(
    "name",
    ["all", "none", "alternate", "first_half", "last_half", "single",
     "sparse", "dense", "block_edges", "row_edges", "spill_heavy"],
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
        v[[0, TILE - 1, TILE, TILE + 1, BLK - 1, BLK, 2 * BLK - 1]] = PASS
    elif name == "row_edges":
        # lane-0/lane-127 survivors stress the rotation wrap (t < phi)
        v = np.full(n, FAIL)
        v[i % 128 == 0] = PASS
        v[i % 128 == 127] = PASS
    elif name == "spill_heavy":
        # >99% pass with a shifting phase: every tile spills into the
        # 129th output row (the last-run-tail identity) at a new phase
        v = np.full(n, PASS)
        v[rng.integers(0, n, 37)] = FAIL
    v = v + (i % 128).astype(np.uint32)
    check(v)


def test_empty_tail_rows(rng):
    # final rows of a tile all-fail: the last-run spill identity must not
    # read stale data (spill only written when phase+cnt crosses 16384)
    n = 2 * BLK
    v = np.full(n, PASS, np.uint32)
    v[TILE - 5 * 128 : TILE] = FAIL
    v[BLK - 3 * 128 :] = FAIL
    check(v)


def test_stability_preserves_order(rng):
    n = 2 * BLK
    v = rng.integers(0, 2**32, n, dtype=np.uint32)
    out, cnt = filter_compact_pallas4(jnp.asarray(v), interpret=True)
    expect = v[v < THR]
    np.testing.assert_array_equal(np.asarray(out)[: int(cnt)], expect)


def test_padded_wrapper(rng):
    # arbitrary length + tail poisoning (ops.filter.filter_compact contract)
    n = 100_000
    v = rng.integers(0, 2**32, n, dtype=np.uint32)
    out, cnt = filter_pallas4_padded(jnp.asarray(v), interpret=True)
    expect = v[v < THR]
    cnt = int(cnt)
    assert cnt == len(expect)
    np.testing.assert_array_equal(np.asarray(out)[:cnt], expect)
    np.testing.assert_array_equal(
        np.asarray(out)[cnt:], np.zeros(n - cnt, np.uint32)
    )
