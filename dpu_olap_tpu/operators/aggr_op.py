"""Sum-aggregate operator drivers.

SumTpu — reference SumDpu (host/aggr/aggr_dpu.cc:31-89): broadcast params,
per-round copy + exec, gather per-DPU uint64 partials, host-side total. Here
the exact uint64 pair reduction (ops/aggregate.py) runs over the sharded
array in one jit — XLA inserts the cross-device psum — and the host combines
per-round (lo, hi) pairs.

SumNative — arrow aggregate ExecPlan oracle (host/aggr/aggr_native.cc).
"""

from __future__ import annotations

import jax
import numpy as np

from ..columnar import Table
from ..ops.aggregate import sum_f64_partials, sum_u64_pair, u64_pair_to_int
from ..parallel.mesh import DeviceSet
from ..timer import Timers, timed


class SumTpu:
    """Integer columns use the exact uint64 pair reduction; float columns use
    the Double variant (device f32 block partials + host f64 combine) — the
    TPU analog of the reference's AggrNative<UInt64Array>/<DoubleArray> pair
    (host/aggr/aggr_native.cc:95-96)."""

    def __init__(self, ds: DeviceSet, table: Table, column: str = "a"):
        self.ds, self.table, self.column = ds, table, column
        self.timers = Timers()

    def Prepare(self):
        self._fn = jax.jit(sum_u64_pair)
        self._ffn = jax.jit(sum_f64_partials)
        return self

    def Run(self) -> int | float:
        d = self.ds.nr_devices
        cols = [np.asarray(b[self.column]) for b in self.table]
        is_float = np.issubdtype(cols[0].dtype, np.floating)
        even = (
            len(cols) % d == 0
            and len({c.shape[0] for c in cols}) == 1
        )
        with timed(self.timers, "copy-to-device"):
            if even:
                dev = self.ds.scatter(np.stack(cols).reshape(d, -1))
            else:  # ragged batches (e.g. post-filter): single-array path
                dev = jax.device_put(np.concatenate(cols))
        if is_float:
            with timed(self.timers, "device-work"):
                parts = self._ffn(dev)
            with timed(self.timers, "copy-from-device"):
                return float(np.asarray(parts, dtype=np.float64).sum())
        with timed(self.timers, "device-work"):
            lo, hi = self._fn(dev)
        with timed(self.timers, "copy-from-device"):
            return u64_pair_to_int(np.asarray(lo), np.asarray(hi))

    def Timers(self):
        return self.timers


class SumNative:
    def __init__(self, table: Table, column: str = "a"):
        self.table, self.column = table, column
        self.timers = Timers()

    def Prepare(self):
        import pyarrow as pa

        self._chunked = pa.chunked_array(
            [pa.array(np.asarray(b[self.column])) for b in self.table]
        )
        return self

    def Run(self) -> int | float:
        import pyarrow.compute as pc

        with timed(self.timers, "native-work"):
            out = pc.sum(self._chunked).as_py()
            # UInt64 for integer inputs, Double for float inputs — the two
            # reference instantiations (aggr_native.cc:95-96).
            return float(out) if isinstance(out, float) else int(out)

    def Timers(self):
        return self.timers
