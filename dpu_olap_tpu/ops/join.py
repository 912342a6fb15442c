"""Single-shard PK/FK inner hash join: build + probe + take.

Reference pipeline (dpu/join/main.c:94-140): one device binary dispatches
KernelHashBuild (insert pk -> row index, hash_build.c), KernelHashProbe
(fk lookup -> selection_indices_vector, hash_probe.c) and KernelTake (gather
right value columns through the selection vector) across launches, keeping
the hash table resident in MRAM between launches (join/main.c:42-50).

TPU-native: the three launches fuse into one jitted program per shard — the
table lives in HBM as ordinary JAX arrays threaded between the stages, so XLA
sees the whole dataflow (the cross-launch MRAM persistence trick becomes
plain SSA values). Output rows keep the left (probe-side) order; the
reference's output order differs per DPU anyway, and its differential tests
sort-normalize before comparing (host/join/join_test.cc:27-38).

Two algorithms:
  * "cuckoo" — vectorized cuckoo build + d-gather probe (ops/hashtable.py).
  * "sort"   — sort-probe join: sort right by key, binary-search each fk
               (jnp.searchsorted), gather. Same result set; preferred when
               the build side would be built once and probed once (sorting
               is one fused XLA op and probing is log(n) gathers).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FLAGS
from .hashtable import EMPTY, ht_build, ht_probe, table_capacity
from .take import take


@partial(jax.jit, static_argnames=("impl",))
def probe_indices(
    left_fk: jnp.ndarray,
    right_pk: jnp.ndarray,
    right_valid: jnp.ndarray | None = None,
    left_valid: jnp.ndarray | None = None,
    impl: str = "cuckoo",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each left row, the right row index holding its pk (the
    selection_indices_vector of hash_probe.c) plus a found mask."""
    n_right = right_pk.shape[0]
    if impl == "cuckoo":
        cap = table_capacity(n_right, FLAGS.ht_load_factor)
        rows = jax.lax.broadcasted_iota(jnp.uint32, (n_right,), 0)
        table = ht_build(right_pk, rows, cap, valid=right_valid)
        sel, found = ht_probe(table, left_fk)
    elif impl == "sort":
        pk = right_pk.astype(jnp.uint32)
        if right_valid is not None:
            pk = jnp.where(right_valid, pk, EMPTY)  # floats invalid to the end
        order = jnp.argsort(pk).astype(jnp.uint32)
        pk_sorted = jnp.take(pk, order)
        pos = jnp.searchsorted(pk_sorted, left_fk.astype(jnp.uint32))
        pos = jnp.minimum(pos, n_right - 1).astype(jnp.int32)
        found = jnp.take(pk_sorted, pos) == left_fk.astype(jnp.uint32)
        sel = jnp.take(order, pos)
    else:
        raise ValueError(f"unknown join impl {impl!r}")
    if left_valid is not None:
        found = found & left_valid
    return sel, found


@partial(jax.jit, static_argnames=("impl",))
def join_shard(
    left_fk: jnp.ndarray,
    left_payload: Tuple[jnp.ndarray, ...],
    right_pk: jnp.ndarray,
    right_payload: Tuple[jnp.ndarray, ...],
    left_valid: jnp.ndarray | None = None,
    right_valid: jnp.ndarray | None = None,
    impl: str = "cuckoo",
):
    """Inner join of one co-partitioned shard pair.

    Returns (fk, left_payload..., right_payload_gathered..., matched) with one
    output row per left row (PK side unique => at most one match each), left
    order preserved. ``matched`` is all-true for valid lanes under the
    reference's guaranteed-match contract; padded lanes are unmatched.
    """
    sel, found = probe_indices(
        left_fk, right_pk, right_valid=right_valid, left_valid=left_valid, impl=impl
    )
    safe_sel = jnp.where(found, sel, 0).astype(jnp.int32)
    right_cols = tuple(
        jnp.where(found, jnp.take(col, safe_sel), 0) for col in right_payload
    )
    return left_fk, left_payload, right_cols, found


def join_result_to_numpy(fk, left_cols, right_cols, matched):
    """Compact a padded join shard result to host numpy arrays (valid rows
    only) — the host-side 'build result' stage (join_dpu.cc:371-399)."""
    m = np.asarray(matched)
    out = [np.asarray(fk)[m]]
    out += [np.asarray(c)[m] for c in left_cols]
    out += [np.asarray(c)[m] for c in right_cols]
    return out
