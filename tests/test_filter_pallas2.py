"""Tests for the v2 (search + gather + transpose) filter compaction kernel.

v2 is a measured negative result on v5e (see the module docstring of
ops/filter_pallas2.py) but stays correctness-tested so the documented
experiment remains runnable and its Mosaic lowering pinned.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.filter_pallas2 import (
    filter_compact_pallas2,
    filter_with_indices_pallas2,
)

BLK = 256 * 128
THR = 1 << 30


def check(v):
    out, cnt = filter_compact_pallas2(jnp.asarray(v), interpret=True)
    out, cnt = np.asarray(out), int(cnt)
    expect = v[v < THR]
    assert cnt == len(expect)
    np.testing.assert_array_equal(out[:cnt], expect)
    o2, s2, c2 = filter_with_indices_pallas2(jnp.asarray(v), interpret=True)
    assert int(c2) == cnt
    np.testing.assert_array_equal(np.asarray(o2)[:cnt], expect)
    np.testing.assert_array_equal(
        np.asarray(s2)[:cnt], np.nonzero(v < THR)[0].astype(np.uint32)
    )


def test_random_blocks(rng):
    check(rng.integers(0, 2**32, 4 * BLK, dtype=np.uint32))


def test_small_tile_block(rng):
    # 128-row degrade path (n not a multiple of the default 256-row block)
    check(rng.integers(0, 2**32, 128 * 128, dtype=np.uint32))


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
        v = np.full(n, FAIL)
        v[[0, BLK - 1, BLK, BLK + 1, 2 * BLK - 1]] = PASS
    v = (v + (i % 128).astype(np.uint32)).astype(np.uint32)
    check(v)
