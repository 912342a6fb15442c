"""Multi-host (virtual) hierarchical shuffle + join tests on a 2x4 mesh."""

import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pytest

from dpu_olap_tpu.generator import make_join_tables
from dpu_olap_tpu.parallel.multihost import dist_join_2d, make_mesh_2d


def sort_table(t: pa.Table) -> pa.Table:
    return t.sort_by([(n, "ascending") for n in t.column_names])


@pytest.fixture(scope="module")
def mesh():
    return make_mesh_2d(n_hosts=2, chips_per_host=4)


def test_mesh_axes(mesh):
    assert mesh.shape["dcn"] == 2 and mesh.shape["ici"] == 4


def test_dist_join_2d_differential(mesh):
    n_b, bl, br = 8, 1 << 11, 1 << 10
    left, right = make_join_tables(n_b, bl, br)
    lf = left.concat()
    rt = right.concat()
    fk, (y,), (x,), matched, overflow = dist_join_2d(
        mesh, lf["fk"], (lf["y"],), rt["pk"], (rt["x"],)
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


def test_hierarchical_matches_flat(mesh, rng):
    """Hierarchical (2x4) and flat (8) shuffles must produce the same join
    result multiset on identical inputs."""
    from dpu_olap_tpu.parallel.dist_join import dist_join
    from dpu_olap_tpu.parallel.mesh import DeviceSet

    n = 8 * 1024
    pk = np.arange(n, dtype=np.uint32)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    fk = rng.integers(0, n, n).astype(np.uint32)
    y = np.arange(n, dtype=np.uint32)

    fk2, (y2,), (x2,), m2, ov2 = dist_join_2d(
        mesh, jnp.asarray(fk), (jnp.asarray(y),), jnp.asarray(pk), (jnp.asarray(x),)
    )
    ds = DeviceSet.allocate(8)
    fk1, (y1,), (x1,), m1, ov1 = dist_join(
        ds, jnp.asarray(fk), (jnp.asarray(y),), jnp.asarray(pk), (jnp.asarray(x),)
    )
    assert not np.any(np.asarray(ov1)) and not np.any(np.asarray(ov2))
    a = np.stack([np.asarray(fk1)[np.asarray(m1)], np.asarray(y1)[np.asarray(m1)], np.asarray(x1)[np.asarray(m1)]])
    b = np.stack([np.asarray(fk2)[np.asarray(m2)], np.asarray(y2)[np.asarray(m2)], np.asarray(x2)[np.asarray(m2)]])
    # same multiset of joined rows
    np.testing.assert_array_equal(
        a[:, np.lexsort(a)], b[:, np.lexsort(b)]
    )


def test_dist_join_2d_multi_round_resident(mesh):
    # Device-resident multi-round form on the hierarchical mesh: one
    # two-stage exchange into rounds*H*C global partitions, lax.scan over
    # each device's resident rounds (same contract as the flat rounds>1).
    n_b, bl, br = 8, 1 << 11, 1 << 10
    left, right = make_join_tables(n_b, bl, br)
    lf = left.concat()
    rt = right.concat()
    fk, (y,), (x,), matched, overflow = dist_join_2d(
        mesh, lf["fk"], (lf["y"],), rt["pk"], (rt["x"],), rounds=2
    )
    assert not np.any(np.asarray(overflow))
    m = np.asarray(matched)
    assert m.sum() == n_b * bl
    got = pa.Table.from_arrays(
        [pa.array(np.asarray(fk)[m]), pa.array(np.asarray(y)[m]),
         pa.array(np.asarray(x)[m])],
        names=["fk", "y", "x"],
    )
    expect = pa.Table.from_batches([b.to_arrow() for b in left]).join(
        pa.Table.from_batches([b.to_arrow() for b in right]),
        keys="fk", right_keys="pk", join_type="inner",
    ).select(["fk", "y", "x"])
    assert sort_table(got).equals(sort_table(expect))
