import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pytest

from dpu_olap_tpu.generator import make_join_tables
from dpu_olap_tpu.parallel.dist_join import dist_join
from dpu_olap_tpu.parallel.mesh import DeviceSet


def sort_table(t: pa.Table) -> pa.Table:
    return t.sort_by([(n, "ascending") for n in t.column_names])


@pytest.mark.parametrize("impl", ["cuckoo", "sort", "cosort"])
def test_dist_join_differential_vs_arrow(impl):
    # 8 batches on 8 virtual devices — the join_test.cc:82-121 analog:
    # randomized PK/FK join, per-column equality after canonical sort.
    ds = DeviceSet.allocate(8)
    n_b, bl, br = 8, 1 << 11, 1 << 10
    left, right = make_join_tables(n_b, bl, br)

    lf = left.concat()
    rt = right.concat()
    fk, (y,), (x,), matched, overflow = dist_join(
        ds,
        lf["fk"], (lf["y"],),
        rt["pk"], (rt["x"],),
        impl=impl,
    )
    assert not np.any(np.asarray(overflow))
    m = np.asarray(matched)
    assert m.sum() == n_b * bl  # guaranteed-match inner join: every left row
    got = pa.Table.from_arrays(
        [pa.array(np.asarray(fk)[m]), pa.array(np.asarray(y)[m]), pa.array(np.asarray(x)[m])],
        names=["fk", "y", "x"],
    )
    expect = pa.Table.from_batches([b.to_arrow() for b in left]).join(
        pa.Table.from_batches([b.to_arrow() for b in right]),
        keys="fk", right_keys="pk", join_type="inner",
    ).select(["fk", "y", "x"])
    assert sort_table(got).equals(sort_table(expect))


def test_dist_join_skewed_keys(rng):
    # Skewed fk distribution (BASELINE.json north star: skew handling) —
    # 50% of fks hit 1% of the pk space. Shuffle cells must not overflow at
    # slack 2.0 because *partitions* are hash-of-key balanced only if keys
    # are distinct; here probe-side dupes concentrate. Use a larger slack.
    ds = DeviceSet.allocate(8)
    n = 8 * 1024
    pk = np.arange(n, dtype=np.uint32)
    x = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    hot = rng.integers(0, n // 100, size=n // 2).astype(np.uint32)
    cold = rng.integers(0, n, size=n - n // 2).astype(np.uint32)
    fk = np.concatenate([hot, cold]).astype(np.uint32)
    rng.shuffle(fk)
    y = np.arange(n, dtype=np.uint32)

    fko, (yo,), (xo,), matched, overflow = dist_join(
        ds,
        jnp.asarray(fk), (jnp.asarray(y),),
        jnp.asarray(pk), (jnp.asarray(x),),
        cell_left=2048,  # hot-key fragments can approach full local size
    )
    assert not np.any(np.asarray(overflow))
    m = np.asarray(matched)
    assert m.sum() == n
    # verify every output row: x must equal the x of its fk row
    np.testing.assert_array_equal(np.asarray(xo)[m], x[np.asarray(fko)[m]])


@pytest.mark.parametrize("rounds", [2, 4])
def test_dist_join_multi_round_resident(rounds):
    # Device-resident multi-round form (VERDICT r2 #4): one all_to_all into
    # rounds*D global partitions, then a lax.scan joins each device's rounds
    # sequentially — differential vs the single-round result and pyarrow.
    ds = DeviceSet.allocate(8)
    n_b, bl, br = 16, 1 << 10, 1 << 10
    left, right = make_join_tables(n_b, bl, br)
    lf = left.concat()
    rt = right.concat()
    fk, (y,), (x,), matched, overflow = dist_join(
        ds,
        lf["fk"], (lf["y"],),
        rt["pk"], (rt["x"],),
        impl="cosort",
        rounds=rounds,
    )
    assert not np.any(np.asarray(overflow))
    m = np.asarray(matched)
    assert m.sum() == n_b * bl
    got = pa.Table.from_arrays(
        [pa.array(np.asarray(fk)[m]), pa.array(np.asarray(y)[m]), pa.array(np.asarray(x)[m])],
        names=["fk", "y", "x"],
    )
    expect = pa.Table.from_batches([b.to_arrow() for b in left]).join(
        pa.Table.from_batches([b.to_arrow() for b in right]),
        keys="fk", right_keys="pk", join_type="inner",
    ).select(["fk", "y", "x"])
    assert sort_table(got).equals(sort_table(expect))


def test_join_tpu_multi_round_operator():
    # JoinTpu._run_ici(rounds=2): the operator-level multi-round resident
    # path, 16 batches over 8 devices with NO host staging between rounds.
    from dpu_olap_tpu.operators.join_op import JoinNative, JoinTpu

    ds = DeviceSet.allocate(8)
    n_b, per = 16, 1 << 10
    left, right = make_join_tables(n_b, per, per)
    op = JoinTpu(ds, left, right).Prepare()
    out = op._run_ici(rounds=2)
    native = JoinNative(left, right).Prepare().Run()
    got = pa.Table.from_arrays(
        [pa.array(out["fk"]), pa.array(out["y"]), pa.array(out["x"])],
        names=["fk", "y", "x"],
    )
    assert sort_table(got).equals(sort_table(native.select(["fk", "y", "x"])))


def test_join_phase_timers_flag():
    # ACTIVATE_JOIN_TIMERS analog: the ICI path attributes fragments /
    # exchange / local-join phase ms via chained prefix probes
    # (dist_join.dist_join_phase_ms) and surfaces them on the operator.
    from dpu_olap_tpu.config import FLAGS
    from dpu_olap_tpu.operators.join_op import JoinTpu

    ds = DeviceSet.allocate(8)
    left, right = make_join_tables(8, 1 << 10, 1 << 10)
    old = FLAGS.join_timers
    FLAGS.join_timers = True
    try:
        op = JoinTpu(ds, left, right).Prepare()
        op.Run()
    finally:
        FLAGS.join_timers = old
    assert set(op.phase_ms) == {"fragments-ms", "exchange-ms", "local-join-ms"}
    # prefixes are cumulative, so every attributed delta is finite; the
    # total is positive (individual deltas can jitter on the CPU proxy)
    assert all(np.isfinite(v) for v in op.phase_ms.values())
    assert sum(op.phase_ms.values()) > 0
