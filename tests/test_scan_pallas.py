"""Segment-propagate kernel tests (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.scan_pallas import propagate_last

BLK = 256 * 128


def oracle(alive, vals):
    has = np.zeros(len(alive), bool)
    out = [np.zeros(len(alive), v.dtype) for v in vals]
    cur_has, cur = False, [0] * len(vals)
    for i in range(len(alive)):
        if alive[i]:
            cur_has, cur = True, [v[i] for v in vals]
        has[i] = cur_has
        for k in range(len(vals)):
            out[k][i] = cur[k] if cur_has else 0
    return has, out


@pytest.mark.parametrize("density", [0.0, 0.01, 0.5, 1.0])
def test_propagate_random(rng, density):
    n = 2 * BLK
    alive = rng.random(n) < density
    v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    v2 = rng.integers(0, 2**32, n, dtype=np.uint32)
    has, (o1, o2) = propagate_last(
        jnp.asarray(alive), (jnp.asarray(v1), jnp.asarray(v2)), interpret=True
    )
    ehas, (e1, e2) = oracle(alive, [v1, v2])
    np.testing.assert_array_equal(np.asarray(has), ehas)
    np.testing.assert_array_equal(np.asarray(o1)[ehas], e1[ehas])
    np.testing.assert_array_equal(np.asarray(o2)[ehas], e2[ehas])


def test_propagate_block_boundary(rng):
    # single alive element near the end of block 0 must carry through blocks 1+
    n = 3 * BLK
    alive = np.zeros(n, bool)
    alive[BLK - 2] = True
    v = rng.integers(0, 2**32, n, dtype=np.uint32)
    has, (o,) = propagate_last(jnp.asarray(alive), (jnp.asarray(v),), interpret=True)
    assert not np.asarray(has)[: BLK - 2].any()
    assert np.asarray(has)[BLK - 2 :].all()
    assert (np.asarray(o)[BLK - 2 :] == v[BLK - 2]).all()


def test_propagate_value_msb_preserved():
    # values with the high bit set survive the int32 SMEM carry bitcast
    n = 2 * BLK
    alive = np.zeros(n, bool)
    alive[7] = True
    v = np.zeros(n, np.uint32)
    v[7] = 0xDEADBEEF
    has, (o,) = propagate_last(jnp.asarray(alive), (jnp.asarray(v),), interpret=True)
    assert np.asarray(o)[-1] == 0xDEADBEEF


def test_propagate_fill_vs_numpy(rng):
    from dpu_olap_tpu.ops.scan_pallas import propagate_fill

    EMPTY = 0xFFFFFFFF
    n = 2 * 512 * 128
    for p_alive in (0.5, 0.002, 0.0, 1.0):
        alive = rng.random(n) < p_alive
        key = np.where(alive, rng.integers(0, 2**31, n, dtype=np.uint32),
                       np.uint32(EMPTY))
        pay = rng.integers(0, 2**32, n, dtype=np.uint32)
        fk, fp = propagate_fill(
            (jnp.asarray(key), jnp.asarray(pay)), interpret=True
        )
        fk, fp = np.asarray(fk), np.asarray(fp)
        last_idx = np.maximum.accumulate(np.where(alive, np.arange(n), -1))
        hasm = last_idx >= 0
        ek = np.full(n, EMPTY, np.uint32)
        ek[hasm] = key[last_idx[hasm]]
        np.testing.assert_array_equal(fk, ek)
        np.testing.assert_array_equal(fp[hasm], pay[last_idx[hasm]])
        assert np.all(fk[~hasm] == EMPTY)
