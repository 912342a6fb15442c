"""Pallas radix-partition cells kernel tests (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.hashing import wang_hash_np
from dpu_olap_tpu.ops.partition_pallas import partition_cells_pallas

BLK = 256 * 128


def oracle_buckets(keys, p):
    shift = 1 + (32 - int(p).bit_length())
    return wang_hash_np(keys) >> np.uint32(shift)


def check(keys, pay, P, cell):
    ck, (cp,), cs, counts, ovf = partition_cells_pallas(
        jnp.asarray(keys), (jnp.asarray(pay),), P, cell, interpret=True
    )
    b = oracle_buckets(keys, P)
    exp = np.bincount(b, minlength=P)
    assert not bool(np.asarray(ovf))
    np.testing.assert_array_equal(np.asarray(counts), exp)
    ckn, cpn, csn = map(np.asarray, (ck, cp, cs))
    for p in range(P):
        sel = np.flatnonzero(b == p)
        c = exp[p]
        np.testing.assert_array_equal(ckn[p, :c], keys[sel])
        np.testing.assert_array_equal(cpn[p, :c], pay[sel])
        np.testing.assert_array_equal(csn[p, :c], sel.astype(np.uint32))


@pytest.mark.parametrize("P", [2, 8, 16])
def test_cells_random(rng, P):
    n = BLK
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    pay = rng.integers(0, 2**32, n, dtype=np.uint32)
    check(keys, pay, P, cell=(n // P) * 4)


def test_cells_multiblock(rng):
    n = 2 * BLK
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    check(keys, pay, 8, cell=(n // 8) * 2)


def test_cells_skewed_single_bucket(rng):
    # all keys in one bucket: full-block fragments exercise the worst-case
    # chunked writes; cell must absorb everything
    n = BLK
    base = rng.integers(0, 2**32, dtype=np.uint32)
    keys = np.full(n, base, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    P = 8
    check(keys, pay, P, cell=n + 128)


def test_cells_overflow_flag(rng):
    n = BLK
    keys = np.zeros(n, dtype=np.uint32)  # one bucket
    pay = np.zeros(n, dtype=np.uint32)
    _, _, _, _, ovf = partition_cells_pallas(
        jnp.asarray(keys), (jnp.asarray(pay),), 8, 1024, interpret=True
    )
    assert bool(np.asarray(ovf))


def test_cells_no_payload(rng):
    n = BLK
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    ck, pays, cs, counts, ovf = partition_cells_pallas(
        jnp.asarray(keys), (), 4, (n // 4) * 2, interpret=True
    )
    assert pays == ()
    b = oracle_buckets(keys, 4)
    np.testing.assert_array_equal(np.asarray(counts), np.bincount(b, minlength=4))
