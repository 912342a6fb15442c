import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from dpu_olap_tpu.ops.filter import (
    FILTER_THRESHOLD,
    filter_compact,
    filter_count,
    filter_with_indices,
)


def arrow_filter_oracle(values: np.ndarray) -> np.ndarray:
    """The native-engine oracle (host/filter/filter_native.cc predicate
    v < 2^30)."""
    arr = pa.array(values)
    return pc.filter(arr, pc.less(arr, pa.scalar(int(FILTER_THRESHOLD), pa.uint32()))).to_numpy()


@pytest.mark.parametrize("impl", ["sort", "scatter"])
def test_filter_crafted_pattern(impl):
    # Crafted selectivity pattern (filter_test.cc:33-61 analog).
    v = np.arange(4096, dtype=np.uint32)
    v[::2] += np.uint32(1 << 30)  # every other row fails
    out, count = filter_compact(jnp.asarray(v), impl=impl)
    expect = arrow_filter_oracle(v)
    assert int(count) == len(expect)
    np.testing.assert_array_equal(np.asarray(out)[: int(count)], expect)
    # padded tail is poisoned to fill value
    assert np.all(np.asarray(out)[int(count):] == 0)


@pytest.mark.parametrize("impl", ["sort", "scatter"])
def test_filter_random_differential(rng, impl):
    v = rng.integers(0, 2**32, size=1 << 16, dtype=np.uint32)
    out, count = filter_compact(jnp.asarray(v), impl=impl)
    expect = arrow_filter_oracle(v)
    assert int(count) == len(expect)
    np.testing.assert_array_equal(np.asarray(out)[: int(count)], expect)
    assert int(filter_count(jnp.asarray(v))) == len(expect)


@pytest.mark.parametrize("impl", ["sort", "scatter"])
@pytest.mark.parametrize("case", ["none", "all"])
def test_filter_edge_selectivity(impl, case):
    n = 1024
    if case == "none":
        v = np.full(n, 1 << 31, dtype=np.uint32)
    else:
        v = np.arange(n, dtype=np.uint32)
    out, count = filter_compact(jnp.asarray(v), impl=impl)
    expect = arrow_filter_oracle(v)
    assert int(count) == len(expect)
    np.testing.assert_array_equal(np.asarray(out)[: int(count)], expect)


@pytest.mark.parametrize("impl", ["sort", "scatter"])
def test_filter_with_indices(rng, impl):
    v = rng.integers(0, 2**32, size=8192, dtype=np.uint32)
    vals, idxs, count = filter_with_indices(jnp.asarray(v), impl=impl)
    c = int(count)
    mask = v < (1 << 30)
    np.testing.assert_array_equal(np.asarray(idxs)[:c], np.flatnonzero(mask))
    np.testing.assert_array_equal(np.asarray(vals)[:c], v[mask])
