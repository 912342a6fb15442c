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
