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
    def __init__(self, ds: DeviceSet, data: Table, indices: Table,
                 data_col: str = "a", idx_col: str = "i"):
        self.ds, self.data, self.indices = ds, data, indices
        self.data_col, self.idx_col = data_col, idx_col
        self.timers = Timers()

    def Prepare(self):
        d = self.ds.nr_devices
        b = len(self.data)
        assert b % d == 0
        self.round_batches = b // d

        def per_device(data, idx):  # (1, round_batches, n) shard-local
            return jax.vmap(take)(data[0], idx[0])

        self._fn = self.ds.shard_fn(per_device, in_specs=(P(AXIS), P(AXIS)), out_specs=P(AXIS))
        return self

    def Run(self) -> List[np.ndarray]:
        d, r = self.ds.nr_devices, self.round_batches
        n = self.data[0].num_rows
        k = self.indices[0].num_rows
        with timed(self.timers, "copy-to-device"):
            data = self.ds.scatter(
                np.stack([np.asarray(b[self.data_col]) for b in self.data]).reshape(d, r, n)
            )
            idx = self.ds.scatter(
                np.stack([np.asarray(b[self.idx_col]) for b in self.indices]).reshape(d, r, k)
            )
        with timed(self.timers, "device-work"):
            out = self._fn(data, idx)
        with timed(self.timers, "copy-from-device"):
            return list(np.asarray(out).reshape(-1, k))

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
