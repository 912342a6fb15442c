"""Take operator drivers.

TakeTpu — reference TakeDpu (host/take/take_dpu.cc:34-104): broadcast params,
per-round copy data+indices, exec, gather fixed-size outputs. Here one SPMD
gather per round over stacked (devices, round_batches, ...) arrays.

TakeNative — arrow::compute::Take per batch (host/take/take_native.cc:18-38).
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from ..columnar import Table
from ..ops.take import take
from ..parallel.mesh import AXIS, DeviceSet
from ..timer import Timers, timed


class TakeTpu:
    """Streaming take: rounds of (devices x batches_per_round) batch pairs
    through one compiled program with bounded in-flight rounds (the
    take_dpu.cc:62-91 round loop + async pipeline)."""

    def __init__(self, ds: DeviceSet, data: Table, indices: Table,
                 data_col: str = "a", idx_col: str = "i"):
        self.ds, self.data, self.indices = ds, data, indices
        self.data_col, self.idx_col = data_col, idx_col
        self.timers = Timers()

    def Prepare(self):
        import jax.numpy as jnp

        from ..ops.filter import _on_tpu
        from ..ops.take_pallas import take_sorted, takeable_sorted
        from ..parallel.streaming import round_geometry

        d = self.ds.nr_devices
        b = len(self.data)
        assert b % d == 0
        n = self.data[0].num_rows
        k = self.indices[0].num_rows
        self.rpr, self.n_rounds = round_geometry(b, d, n)
        rpr = self.rpr

        def per_device_rowgather(data, idx):  # (1, rpr, n) shard-local
            return jax.vmap(take)(data[0], idx[0]), jnp.zeros((1,), jnp.int32)

        # sorted-stream path: fuse the round's rpr batches into ONE
        # sort->stream->sort take over the concatenated table (indices get
        # per-batch offsets), amortizing the index sorts across batches
        self._use_sorted = (
            _on_tpu()
            and takeable_sorted(rpr * n, rpr * k)
            and np.asarray(self.data[0][self.data_col]).dtype.itemsize == 4
        )

        def per_device_sorted(data, idx):
            d2, i2 = data[0], idx[0]  # (rpr, n), (rpr, k)
            offs = (
                jax.lax.broadcasted_iota(jnp.uint32, (rpr, 1), 0)
                * jnp.uint32(n)
            )
            qi = (
                jnp.minimum(i2.astype(jnp.uint32), jnp.uint32(n - 1)) + offs
            ).reshape(rpr * k)
            out, flag = take_sorted(d2.reshape(rpr * n), qi)
            return out.reshape(rpr, k), flag.reshape(1)

        per_device = per_device_sorted if self._use_sorted else per_device_rowgather
        self._fn = self.ds.shard_fn(
            per_device, in_specs=(P(AXIS), P(AXIS)), out_specs=(P(AXIS), P(AXIS))
        )
        # correctness escape hatch for adversarially clustered indices: the
        # row-gather program re-runs an overflowed round (the cell-doubling
        # retry pattern, without a window to size)
        self._fn_fallback = (
            self.ds.shard_fn(
                per_device_rowgather,
                in_specs=(P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P(AXIS)),
            )
            if self._use_sorted
            else self._fn
        )
        return self

    def Run(self) -> List[np.ndarray]:
        from ..parallel.streaming import stream_rounds

        d, rpr = self.ds.nr_devices, self.rpr
        n = self.data[0].num_rows
        k = self.indices[0].num_rows
        per_round = d * rpr

        from .. import native

        def stage(r):
            data = native.parallel_stack(
                [np.asarray(self.data[r * per_round + i][self.data_col])
                 for i in range(per_round)]
            ).reshape(d, rpr, n)
            idx = native.parallel_stack(
                [np.asarray(self.indices[r * per_round + i][self.idx_col])
                 for i in range(per_round)]
            ).reshape(d, rpr, k)
            return data, idx

        def dispatch(r, staged):
            data, idx = staged
            sd, si = self.ds.scatter(data), self.ds.scatter(idx)
            out, flag = self._fn(sd, si)
            return out, flag, (sd, si)

        def collect(r, out):
            vals, flag, staged_dev = out
            if self._use_sorted and int(np.asarray(flag).max()) != 0:
                # window overflow (extreme index clustering): redo the round
                # on the row-gather program — device-resident inputs reused
                vals, _ = self._fn_fallback(*staged_dev)
            return list(np.asarray(vals).reshape(-1, k))

        rounds = stream_rounds(
            self.n_rounds, stage, dispatch, collect, timers=self.timers
        )
        return [c for chunk in rounds for c in chunk]

    def Timers(self):
        return self.timers


class TakeNative:
    def __init__(self, data: Table, indices: Table, data_col: str = "a", idx_col: str = "i"):
        self.data, self.indices = data, indices
        self.data_col, self.idx_col = data_col, idx_col
        self.timers = Timers()

    def Prepare(self):
        import pyarrow as pa

        self._data = [pa.array(np.asarray(b[self.data_col])) for b in self.data]
        self._idx = [pa.array(np.asarray(b[self.idx_col])) for b in self.indices]
        return self

    def Run(self) -> List[np.ndarray]:
        import pyarrow.compute as pc

        with timed(self.timers, "native-work"):
            return [pc.take(d, i).to_numpy() for d, i in zip(self._data, self._idx)]

    def Timers(self):
        return self.timers
