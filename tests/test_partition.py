import jax.numpy as jnp
import numpy as np
import pytest

from dpu_olap_tpu.ops.hashing import wang_hash_np
from dpu_olap_tpu.ops.partition import radix_partition, radix_partition_with_payload


def oracle_buckets(keys: np.ndarray, p: int) -> np.ndarray:
    shift = 1 + (32 - int(p).bit_length())
    return wang_hash_np(keys) >> np.uint32(shift)


@pytest.mark.parametrize("p", [2, 8, 64])
def test_partition_contiguous_and_stable(rng, p):
    keys = rng.integers(0, 2**32, size=1 << 14, dtype=np.uint32)
    res = radix_partition(jnp.asarray(keys), p)
    out = np.asarray(res.keys)
    sel = np.asarray(res.selection_indices)
    counts = np.asarray(res.counts)
    offsets = np.asarray(res.offsets)

    b = oracle_buckets(keys, p)
    np.testing.assert_array_equal(counts, np.bincount(b, minlength=p))
    np.testing.assert_array_equal(offsets, np.concatenate([[0], np.cumsum(counts)[:-1]]))
    # selection indices reproduce the output via a gather (the take-kernel
    # contract, join_dpu.cc:303-368)
    np.testing.assert_array_equal(out, keys[sel])
    # partition-contiguous + stable within partition
    for part in range(p):
        lo, hi = offsets[part], offsets[part] + counts[part]
        seg_sel = sel[lo:hi]
        assert np.all(b[seg_sel] == part)
        assert np.all(np.diff(seg_sel.astype(np.int64)) > 0)  # original order kept


def test_partition_single_partition(rng):
    keys = rng.integers(0, 2**32, size=4096, dtype=np.uint32)
    res = radix_partition(jnp.asarray(keys), 1)
    np.testing.assert_array_equal(np.asarray(res.keys), keys)
    assert int(res.counts[0]) == 4096


def test_partition_with_payload(rng):
    keys = rng.integers(0, 2**32, size=4096, dtype=np.uint32)
    pay = rng.integers(0, 2**32, size=4096, dtype=np.uint32)
    res, (moved,) = radix_partition_with_payload(jnp.asarray(keys), (jnp.asarray(pay),), 8)
    np.testing.assert_array_equal(np.asarray(moved), pay[np.asarray(res.selection_indices)])


def test_resident_partitioner_matches_host_staged():
    # Device-resident repartition (VERDICT r2 #4): same global partitions as
    # the host-staged engine, but nothing leaves HBM until to_host().
    from dpu_olap_tpu.generator import make_filter_batches
    from dpu_olap_tpu.parallel.mesh import DeviceSet
    from dpu_olap_tpu.parallel.partitioner import Partitioner, ResidentPartitioner

    ds = DeviceSet.allocate(8)
    table = make_filter_batches(num_batches=8, batch_size=1 << 12)
    p = 16
    host_parts = Partitioner(ds, p).partition_table(table, "a")
    dparts = ResidentPartitioner(ds, p).partition_table(table, "a")
    assert dparts.nr_partitions == p and dparts.rounds == p // 8
    rows = dparts.partition_rows()
    res_parts = dparts.to_host()
    for i in range(p):
        assert rows[i] == len(res_parts[i]["a"]) == len(host_parts[i]["a"])
        np.testing.assert_array_equal(
            np.sort(res_parts[i]["a"]), np.sort(host_parts[i]["a"])
        )


def test_resident_partitioner_payload_alignment():
    # payload rows must move with their keys through the all-to-all cells
    from dpu_olap_tpu.parallel.mesh import DeviceSet
    from dpu_olap_tpu.parallel.partitioner import ResidentPartitioner

    rng = np.random.default_rng(7)
    ds = DeviceSet.allocate(8)
    n = 8 * (1 << 12)
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    pay = keys ^ np.uint32(0xA5A5A5A5)  # derivable from the key
    dparts = ResidentPartitioner(ds, 16).partition_arrays(
        keys, (pay,), ["k", "v"]
    )
    for part in dparts.to_host():
        np.testing.assert_array_equal(part["v"], part["k"] ^ np.uint32(0xA5A5A5A5))
