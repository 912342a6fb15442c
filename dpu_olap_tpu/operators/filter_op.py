"""Filter operator drivers.

FilterTpu — reference FilterDpu (host/filter/filter_dpu.cc): per round of
NR_DPUS batches, async copy-in -> exec -> post-process gather of
(output_buffer, output_buffer_length) per device, final sync, ChunkedArray
assembly. Here: batches are stacked (devices, round_batches, rows), the
filter kernel runs vmapped inside shard_map, rounds are dispatched
back-to-back (XLA async dispatch provides the copy/compute overlap the
reference builds from rank callbacks), and one final sync gathers counts +
padded values; host assembly slices each chunk.

FilterNative — reference FilterNative (host/filter/filter_native.cc): pyarrow
compute on the CPU pool; the differential oracle.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..columnar import Table
from ..ops.filter import FILTER_THRESHOLD, filter_compact
from ..parallel.mesh import AXIS, DeviceSet
from ..timer import Timers, timed


class FilterTpu:
    def __init__(self, ds: DeviceSet, table: Table, column: str = "a"):
        self.ds = ds
        self.table = table
        self.column = column
        self.timers = Timers()
        self._fn = None

    def Prepare(self):
        """Build the SPMD program (the binary-load analog, filter_dpu.cc:23-32)."""
        d = self.ds.nr_devices
        b = len(self.table)
        assert b % d == 0, f"{b} batches not divisible by {d} devices"
        self.round_batches = b // d

        rb = self.round_batches
        from ..ops.filter import default_predicate

        def per_device(x):  # x: (1, round_batches, n) — leading dim is the shard
            flat = x.reshape(-1)
            # Stable compaction of the concatenation == concatenation of the
            # per-batch compactions, so one kernel pass serves all batches;
            # per-batch counts locate each chunk.
            counts = jnp.sum(
                default_predicate(x[0]).astype(jnp.uint32), axis=1
            )
            out, _total = filter_compact(flat)
            return out, counts

        self._fn = self.ds.shard_fn(per_device, in_specs=P(AXIS), out_specs=P(AXIS))
        return self

    def Run(self) -> List[np.ndarray]:
        d = self.ds.nr_devices
        n = self.table[0].num_rows
        with timed(self.timers, "copy-to-device"):
            host = np.stack([np.asarray(b[self.column]) for b in self.table])
            stacked = host.reshape(d, self.round_batches, n)
            dev = self.ds.scatter(stacked)
        with timed(self.timers, "device-work"):
            padded, counts = self._fn(dev)
        with timed(self.timers, "copy-from-device"):
            flat_h = np.asarray(padded).reshape(d, -1)
            counts_h = np.asarray(counts).reshape(d, self.round_batches)
        with timed(self.timers, "build-result"):
            chunks = []
            for dev_i in range(d):
                off = 0
                for b in range(self.round_batches):
                    c = int(counts_h[dev_i, b])
                    chunks.append(flat_h[dev_i, off : off + c])
                    off += c
        return chunks

    def Timers(self):
        return self.timers


class FilterNative:
    """pyarrow oracle: v < 2^30 per batch (filter_native.cc:59)."""

    def __init__(self, table: Table, column: str = "a"):
        self.table = table
        self.column = column
        self.timers = Timers()

    def Prepare(self):
        import pyarrow as pa

        self._arrays = [pa.array(np.asarray(b[self.column])) for b in self.table]
        return self

    def Run(self) -> List[np.ndarray]:
        import pyarrow as pa
        import pyarrow.compute as pc

        thresh = pa.scalar(int(FILTER_THRESHOLD), pa.uint32())
        with timed(self.timers, "native-work"):
            return [
                pc.filter(arr, pc.less(arr, thresh)).to_numpy() for arr in self._arrays
            ]

    def Timers(self):
        return self.timers
