"""Standalone partition operator.

Reference: host/partition/partition_dpu.cc — currently NON-FUNCTIONAL in the
reference (broken by join-driven changes, README.md:114-118, tests
GTEST_SKIP'd). Provided here in working form: repartition a table into P
global hash partitions, carrying value columns, using the host-staged
Partitioner (parallel/partitioner.py).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..columnar import Table
from ..parallel.mesh import DeviceSet
from ..parallel.partitioner import Partitioner
from ..timer import Timers


class PartitionTpu:
    def __init__(self, ds: DeviceSet, table: Table, key_col: str, nr_partitions: int):
        self.ds, self.table, self.key_col = ds, table, key_col
        self.nr_partitions = nr_partitions
        self.timers = Timers()

    def Prepare(self):
        self.payload_cols = [c for c in self.table.names if c != self.key_col]
        self._parter = Partitioner(self.ds, self.nr_partitions, timers=self.timers)
        return self

    def Run(self) -> List[Dict[str, np.ndarray]]:
        return self._parter.partition_table(self.table, self.key_col, self.payload_cols)

    def Timers(self):
        return self.timers
