import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dpu_olap_tpu.ops.hashing import wang_hash_np
from dpu_olap_tpu.parallel.mesh import AXIS, DeviceSet
from dpu_olap_tpu.parallel.shuffle import (
    default_cell_size,
    local_fragments,
    shuffle_partitions,
)


def oracle_buckets(keys, p):
    shift = 1 + (32 - int(p).bit_length())
    return wang_hash_np(keys) >> np.uint32(shift)


def test_local_fragments(rng):
    keys = rng.integers(0, 2**32, size=1024, dtype=np.uint32)
    pay = rng.integers(0, 2**32, size=1024, dtype=np.uint32)
    ck, (cp,), counts, overflow = jax.jit(
        local_fragments, static_argnums=(2, 3)
    )(jnp.asarray(keys), (jnp.asarray(pay),), 8, 512)
    assert not bool(overflow)
    b = oracle_buckets(keys, 8)
    np.testing.assert_array_equal(np.asarray(counts), np.bincount(b, minlength=8))
    ckn, cpn = np.asarray(ck), np.asarray(cp)
    for p in range(8):
        c = int(counts[p])
        sel = np.flatnonzero(b == p)
        np.testing.assert_array_equal(ckn[p, :c], keys[sel])
        np.testing.assert_array_equal(cpn[p, :c], pay[sel])
        assert np.all(ckn[p, c:] == 0xFFFFFFFF)


def test_local_fragments_overflow():
    keys = jnp.zeros(1024, jnp.uint32)  # all rows hash to one bucket
    _, _, _, overflow = jax.jit(local_fragments, static_argnums=(2, 3))(
        keys, (), 8, 256
    )
    assert bool(overflow)


def test_shuffle_all_rows_land_on_hash_owner(rng):
    ds = DeviceSet.allocate(8)
    n = 8 * 2048
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)  # global row id as payload
    cell = default_cell_size(2048, 8, 2.0)

    fn = ds.shard_fn(
        lambda k, p: shuffle_partitions(k, (p,), 8, cell),
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
    )
    res = fn(ds.scatter(keys), ds.scatter(pay))
    rk = np.asarray(res.keys).reshape(8, 8, cell)  # [dest, src, cell]
    rp = np.asarray(res.payloads[0]).reshape(8, 8, cell)
    counts = np.asarray(res.counts).reshape(8, 8)
    assert not np.any(np.asarray(res.overflow))

    b = oracle_buckets(keys, 8)
    # Each received fragment [dest][src] must equal the rows of source shard
    # src whose bucket == dest, in original order.
    for dest in range(8):
        for src in range(8):
            shard_keys = keys[src * 2048 : (src + 1) * 2048]
            shard_pay = pay[src * 2048 : (src + 1) * 2048]
            sel = np.flatnonzero(oracle_buckets(shard_keys, 8) == dest)
            c = counts[dest, src]
            assert c == len(sel)
            np.testing.assert_array_equal(rk[dest, src, :c], shard_keys[sel])
            np.testing.assert_array_equal(rp[dest, src, :c], shard_pay[sel])
    # Conservation: every row lands somewhere exactly once.
    assert counts.sum() == n


def test_default_cell_size_lane_aligned():
    assert default_cell_size(2048, 8, 2.0) == 512
    assert default_cell_size(100, 8, 1.5) % 128 == 0
    assert default_cell_size(1, 8, 1.0) == 128


def test_shuffle_counts_inband_matches_two_collective(rng):
    # counts_inband=True fuses the counts into the stacked-plane all_to_all
    # (one collective per exchange); the received fragments and counts must
    # be identical to the two-collective default
    ds = DeviceSet.allocate(8)
    n = 8 * 2048
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    cell = default_cell_size(2048, 8, 2.0)

    def run(inband):
        fn = ds.shard_fn(
            lambda k, p: shuffle_partitions(
                k, (p,), 8, cell, counts_inband=inband
            ),
            in_specs=(P(AXIS), P(AXIS)),
            out_specs=P(AXIS),
        )
        return fn(ds.scatter(keys), ds.scatter(pay))

    a = run(False)
    b = run(True)
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    ca = np.asarray(a.counts).reshape(-1)
    ka, kb = np.asarray(a.keys), np.asarray(b.keys)
    pa_, pb = np.asarray(a.payloads[0]), np.asarray(b.payloads[0])
    for f in range(ka.shape[0]):
        c = int(ca[f])
        np.testing.assert_array_equal(ka[f, :c], kb[f, :c])
        np.testing.assert_array_equal(pa_[f, :c], pb[f, :c])
    assert not np.any(np.asarray(b.overflow))
