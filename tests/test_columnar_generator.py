import numpy as np
import pyarrow as pa
import pytest

from dpu_olap_tpu.columnar import Batch, Table
from dpu_olap_tpu.generator import (
    Generator,
    make_filter_batches,
    make_join_tables,
    make_take_batches,
)


def test_batch_roundtrip_arrow(rng):
    cols = {
        "a": rng.integers(0, 2**32, size=1024, dtype=np.uint32),
        "b": rng.integers(0, 2**31, size=1024, dtype=np.int32),
    }
    b = Batch.from_numpy(cols)
    rb = b.to_arrow()
    assert rb.num_rows == 1024
    back = Batch.from_arrow(rb)
    for k in cols:
        np.testing.assert_array_equal(back.to_numpy()[k], cols[k])


def test_batch_ragged_rejected():
    with pytest.raises(ValueError):
        Batch.from_numpy({"a": np.zeros(4, np.uint32), "b": np.zeros(5, np.uint32)})


def test_table_concat_and_rows(rng):
    batches = [
        Batch.from_numpy({"a": rng.integers(0, 100, size=16, dtype=np.uint32)})
        for _ in range(4)
    ]
    t = Table(batches)
    assert t.num_rows == 64
    assert t.concat().num_rows == 64
    assert isinstance(t.to_arrow(), pa.Table)


def test_generator_deterministic():
    a = make_filter_batches(2, 256, seed=42)
    b = make_filter_batches(2, 256, seed=42)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba.to_numpy()["a"], bb.to_numpy()["a"])


def test_index_column_global_sequence():
    # pk continues across batches (generator.cc:59-71)
    c0 = Generator.index_column(0, 128)
    c1 = Generator.index_column(1, 128)
    assert c0[0] == 0 and c0[-1] == 127 and c1[0] == 128


def test_fk_within_matching_batch_range():
    g = Generator(42)
    fk = g.foreign_key_column(batch_index=3, pk_batch_size=1000, batch_size=4096)
    assert fk.min() >= 3000 and fk.max() <= 3999


def test_join_tables_shapes_and_schema():
    left, right = make_join_tables(2, 512, 256)
    assert left[0].names == ["fk", "y"] and right[0].names == ["pk", "x"]
    assert left.num_rows == 1024 and right.num_rows == 512
    # every fk has a matching pk in the corresponding right batch
    for i in range(2):
        fk = left[i].to_numpy()["fk"]
        assert fk.min() >= i * 256 and fk.max() < (i + 1) * 256


def test_take_batches_indices_in_range():
    data, idx = make_take_batches(2, 1024, 128)
    for b in idx:
        i = b.to_numpy()["i"]
        assert i.min() >= 0 and i.max() < 1024
