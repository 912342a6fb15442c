"""Host-staged shuffle engine: device partitioning + host partition assembly.

Reference: host/partition/partitioner.{h,cc} + host/partition/partition.{h,cc}
— the DPUs radix-partition locally, the host reserves slots in global
Partition buffers (GetOffsets, partitioner.cc:280-312) and gathers fragments
into them with scatter/gather DMA or background parallel memcpy
(LoadPartitions :350-375, BackgroundProcessBuffers :249-278).

This engine is the TPU analog of that *host-bounced* path and is used when
the working set spans more partitions than devices (multi-round joins,
standalone repartitioning): devices compute fragments + histograms on-device
(ops/partition.py via parallel/shuffle.local_fragments), the host gathers the
padded cells and assembles global partitions with the native runtime —
PartitionSlab atomic-cursor buffers + the OrderedExecutor's parallel copies
(native/runtime.cpp), mirroring Partition/parallel_memcopy.

The pure-ICI all-to-all path (parallel/shuffle.py) supersedes this when
partitions == devices; benchmarks compare both.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
from jax.sharding import PartitionSpec as P

from ..columnar import Table
from ..config import FLAGS
from ..timer import timed
from .mesh import AXIS, DeviceSet
from .shuffle import default_cell_size, local_fragments


class Partitioner:
    """Repartition a Table into nr_partitions global hash partitions."""

    def __init__(
        self,
        ds: DeviceSet,
        nr_partitions: int,
        slack: float | None = None,
        timers=None,
    ):
        self.ds = ds
        self.nr_partitions = nr_partitions
        self.slack = slack or FLAGS.shuffle_slack
        self.timers = timers
        self._fns = {}

    def _fragment_fn(self, n_rows: int, n_payloads: int, cell: int):
        key = (n_rows, n_payloads, cell)
        if key not in self._fns:
            p = self.nr_partitions

            def per_device(keys, payloads):
                ck, cp, counts, overflow = local_fragments(
                    keys, tuple(payloads), p, cell
                )
                return ck, cp, counts, overflow.reshape(1)  # rank-1 for out_spec

            self._fns[key] = self.ds.shard_fn(
                per_device, in_specs=(P(AXIS), P(AXIS)), out_specs=P(AXIS)
            )
        return self._fns[key]

    def partition_table(
        self, table: Table, key_col: str, payload_cols: Sequence[str] = ()
    ) -> List[Dict[str, np.ndarray]]:
        """Returns one dict of host columns per global partition."""
        from .. import native

        d = self.ds.nr_devices
        b = len(table)
        assert b % d == 0, f"{b} batches not divisible by {d} devices"
        rounds = b // d
        n = table[0].num_rows
        p = self.nr_partitions
        cell = default_cell_size(n, p, self.slack)
        fn = self._fragment_fn(n, len(payload_cols), cell)

        total_rows = b * n
        cap = int(total_rows / p * self.slack) + cell  # per-partition capacity
        dtypes = [np.uint32] * (1 + len(payload_cols))
        use_native = native.available()
        if use_native:
            slabs = [native.PartitionSlab(dtypes, cap) for _ in range(p)]
            executor = native.OrderedExecutor(min(8, p))
        else:  # pure-python fallback
            slabs = [[np.empty(0, np.uint32) for _ in dtypes] for _ in range(p)]

        # Device work per round through the bounded streaming pipeline
        # (background host staging, async dispatch, at most
        # FLAGS.stream_max_inflight outstanding rounds — the reference bounds
        # its per-rank job queues the same way, nrJobsPerRank); previously
        # all rounds' device outputs accumulated before any gather, which at
        # many rounds re-created the OOM the round loop exists to avoid.
        from .streaming import stream_rounds

        def stage(r):
            batch = np.stack(
                [np.asarray(table[r * d + i][key_col]) for i in range(d)]
            )
            payloads = [
                np.stack([np.asarray(table[r * d + i][c]) for i in range(d)])
                for c in payload_cols
            ]
            return batch, payloads

        def dispatch(r, staged):
            batch, payloads = staged
            dev_keys = self.ds.scatter(batch)
            dev_pay = [self.ds.scatter(x) for x in payloads]
            return fn(dev_keys, dev_pay)

        def collect(r, handle):
            ck, cp, counts, overflow = handle
            ck_h = np.asarray(ck).reshape(d, p, cell)
            cp_h = [np.asarray(x).reshape(d, p, cell) for x in cp]
            counts_h = np.asarray(counts).reshape(d, p)
            if np.any(np.asarray(overflow)):
                raise OverflowError(
                    "partition fragment exceeded cell size; raise shuffle_slack"
                )
            for dev in range(d):
                for part in range(p):
                    c = int(counts_h[dev, part])
                    if c == 0:
                        continue
                    if use_native:
                        start = slabs[part].reserve(c)
                        executor.submit_partition_write(
                            part, slabs[part], 0,
                            np.ascontiguousarray(ck_h[dev, part, :c]), start,
                        )
                        for ci, col in enumerate(cp_h):
                            executor.submit_partition_write(
                                part, slabs[part], 1 + ci,
                                np.ascontiguousarray(col[dev, part, :c]), start,
                            )
                    else:
                        slabs[part][0] = np.concatenate(
                            [slabs[part][0], ck_h[dev, part, :c]]
                        )
                        for ci, col in enumerate(cp_h):
                            slabs[part][1 + ci] = np.concatenate(
                                [slabs[part][1 + ci], col[dev, part, :c]]
                            )
            return None

        stream_rounds(rounds, stage, dispatch, collect, timers=self.timers)

        names = [key_col, *payload_cols]
        out: List[Dict[str, np.ndarray]] = []
        if use_native:
            executor.sync()
            for part in range(p):
                out.append(
                    {nm: np.array(slabs[part].column(i)) for i, nm in enumerate(names)}
                )
        else:
            for part in range(p):
                out.append({nm: slabs[part][i] for i, nm in enumerate(names)})
        return out
