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

Three algorithms (chosen from measurement on TPU v5e — element-granular
scatter/gather lower ~100x off HBM bandwidth in XLA, sorts run ~600M rows/s):
  * "cosort" (default) — co-sort join: sort the concatenation of both sides
               by (key, side) so every pk immediately precedes its fks, then
               propagate the pk's row/payload forward with one associative
               scan, and restore probe-side order with a second sort. No
               per-element gathers or scatters at all; measured ~10x faster
               than the alternatives on v5e. join_shard_fused skips the
               restore sort and emits key-sorted padded rows directly.
  * "cuckoo" — vectorized cuckoo build + d-gather probe (ops/hashtable.py).
               The Wang-hash table component kept for parity with the
               reference's MRAM hash table; scatter-bound on current XLA.
  * "sort"   — sort right side + jnp.searchsorted probe. searchsorted
               lowers poorly on TPU; kept as a simple oracle.
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


def _check_32bit_payloads(*payload_tuples):
    """The fused/merge joins carry payloads as uint32 sort operands; 64-bit or
    float payloads would be silently truncated by astype. Same-width integer
    converts round-trip exactly, so {u,}int32 are fine — anything else must
    fail loudly (the XLA join_shard path preserves dtypes instead)."""
    for cols in payload_tuples:
        for c in cols:
            if c.dtype.itemsize != 4 or not jnp.issubdtype(c.dtype, jnp.integer):
                raise TypeError(
                    f"fused join payloads must be 32-bit integers, got {c.dtype}; "
                    "use join_shard(impl=...) for other payload dtypes"
                )


def _fill_forward(planes):
    """Forward-fill all planes from the most recent position where plane 0
    != EMPTY (plane 0 carries the sentinel; pairs move together). Returns the
    filled tuple; has = filled[0] != EMPTY.

    On TPU this is the two-level Pallas fill kernel (scan_pallas.propagate_
    fill) — measured ~3x the generic alive-plane propagate it replaces and
    one fewer plane of traffic; the associative_scan fallback serves CPU
    (the TPU lowering of associative_scan compile-hangs at Mi-scale).
    """
    from .filter import _on_tpu

    planes = tuple(p.astype(jnp.uint32) for p in planes)
    if _on_tpu():
        from .scan_pallas import DEF_R, LANES, propagate_fill

        n = planes[0].shape[0]
        blk = 2 * DEF_R * LANES
        pad = (-n) % blk
        if pad:
            planes = tuple(
                jnp.concatenate(
                    [p, jnp.full((pad,), EMPTY if i == 0 else 0, jnp.uint32)]
                )
                for i, p in enumerate(planes)
            )
        filled = propagate_fill(planes)
        return tuple(f[:n] for f in filled)

    def combine(a, b):
        take = b[0] != EMPTY
        return tuple(jnp.where(take, bx, ax) for ax, bx in zip(a, b))

    return jax.lax.associative_scan(combine, planes)


def _cosort_probe(left_fk, right_pk, right_valid, left_valid):
    """(selection, found) in LEFT row order via co-sort + scan + restore sort."""
    n_r, n_l = right_pk.shape[0], left_fk.shape[0]
    pk = right_pk.astype(jnp.uint32)
    fk = left_fk.astype(jnp.uint32)
    if right_valid is not None:
        pk = jnp.where(right_valid, pk, EMPTY)
    fkk = jnp.where(left_valid, fk, EMPTY) if left_valid is not None else fk
    keys = jnp.concatenate([pk, fkk])
    side = jnp.concatenate(
        [jnp.zeros((n_r,), jnp.int32), jnp.ones((n_l,), jnp.int32)]
    )
    rowid = jnp.concatenate(
        [
            jax.lax.broadcasted_iota(jnp.uint32, (n_r,), 0),
            jax.lax.broadcasted_iota(jnp.uint32, (n_l,), 0),
        ]
    )
    sk, sside, srow = jax.lax.sort([keys, side, rowid], num_keys=2)
    is_pk = sside == 0
    pkey, prow = _fill_forward((jnp.where(is_pk, sk, EMPTY), srow))
    has = pkey != jnp.uint32(EMPTY)
    found_sorted = has & (pkey == sk) & (sside == 1) & (sk != EMPTY)
    # restore probe-side order: sort by original left row (pk rows to the end)
    left_pos = jnp.where(sside == 1, srow, jnp.uint32(n_l))
    _, sel2, found2 = jax.lax.sort(
        [left_pos, prow, found_sorted.astype(jnp.uint32)], num_keys=1
    )
    return sel2[:n_l], found2[:n_l] == 1


@partial(jax.jit, static_argnames=("keys31",))
def join_shard_fused(
    left_fk: jnp.ndarray,
    left_payload: Tuple[jnp.ndarray, ...],
    right_pk: jnp.ndarray,
    right_payload: Tuple[jnp.ndarray, ...],
    left_valid: jnp.ndarray | None = None,
    right_valid: jnp.ndarray | None = None,
    keys31: bool = False,
):
    """Fully-fused co-sort join: payload columns ride the sort and the
    propagation scan, so there are no gathers at all. Output rows come back
    key-sorted (NOT left order) and padded to n_left + n_right with a
    ``matched`` mask — the natural contract for the distributed path, whose
    consumers compact by mask anyway (the reference's DPU row order equally
    differs from input order, host/join/join_test.cc sort-normalizes).

    keys31: the join needs key GROUPING, not key order, so any strict order
    on (key, side) works. When all keys < 2^31 - 1 (the reference's own
    workload: pk is a sequential index, join_benchmark.cc:71-107), side packs
    into the sort key as k2 = key<<1 | side, dropping one live sort operand —
    measured ~1.3 ms/operand on a 4Mi flat sort (MEASURE_R2.json sortlive
    table). k2 values >= 0xFFFFFFFE decode back to EMPTY, which is why
    0x7FFFFFFF itself is excluded from the packed range. Callers assert the
    range (operators detect it on the host-resident key columns); the
    generic 32-bit path keeps side as an operand.

    Returns (fk, left_cols, right_cols, matched), each of length n_l + n_r.
    """
    _check_32bit_payloads(left_payload, right_payload)
    n_r, n_l = right_pk.shape[0], left_fk.shape[0]
    m_l, m_r = len(left_payload), len(right_payload)
    pk = right_pk.astype(jnp.uint32)
    fk = left_fk.astype(jnp.uint32)
    if right_valid is not None:
        pk = jnp.where(right_valid, pk, EMPTY)
    fkk = jnp.where(left_valid, fk, EMPTY) if left_valid is not None else fk
    # Sort-traffic minimization: (a) lax.sort is stable and the pk side is
    # concatenated first, so pk-before-equal-fk ordering comes for free —
    # ``side`` rides as a non-key operand (or inside the key under keys31);
    # (b) left and right payloads occupy disjoint rows, so payload k of both
    # sides shares ONE merged operand.
    zeros_r = jnp.zeros((n_r,), jnp.uint32)
    zeros_l = jnp.zeros((n_l,), jnp.uint32)
    merged = []
    for k in range(max(m_l, m_r)):
        right_half = right_payload[k].astype(jnp.uint32) if k < m_r else zeros_r
        left_half = left_payload[k].astype(jnp.uint32) if k < m_l else zeros_l
        merged.append(jnp.concatenate([right_half, left_half]))
    if keys31:
        # EMPTY (0xFFFFFFFF) maps to 0xFFFFFFFE/FFFFFFFF — still the maximum,
        # still sorts invalid lanes to the end.
        k2 = jnp.concatenate(
            [pk << jnp.uint32(1), (fkk << jnp.uint32(1)) | jnp.uint32(1)]
        )
        # With side packed into the key, stability is irrelevant, so the
        # ~2x-faster Pallas merge-tree sort applies (ops/sort_pallas.py);
        # the generic path below relies on lax.sort's stability for
        # pk-before-equal-fk and must keep the flat sort.
        from .filter import _on_tpu
        from .sort_pallas import sort_bitonic, sortable_bitonic

        if _on_tpu() and sortable_bitonic(k2.shape[0]):
            sorted_all = sort_bitonic((k2, *merged))
        else:
            sorted_all = jax.lax.sort([k2, *merged], num_keys=1)
        sk2 = sorted_all[0]
        smerged = sorted_all[1:]
        sk = sk2 >> jnp.uint32(1)
        is_pk = (sk2 & jnp.uint32(1)) == 0
        sk = jnp.where(sk2 >= jnp.uint32(0xFFFFFFFE), EMPTY, sk)
        sside_fk = ~is_pk
    else:
        keys = jnp.concatenate([pk, fkk])
        side = jnp.concatenate(
            [jnp.zeros((n_r,), jnp.int32), jnp.ones((n_l,), jnp.int32)]
        )
        sorted_all = jax.lax.sort([keys, side, *merged], num_keys=1)
        sk, sside = sorted_all[0], sorted_all[1]
        smerged = sorted_all[2:]
        is_pk = sside == 0
        sside_fk = sside == 1
    # Payload planes need no pre-masking: the fill kernel moves (key, pay)
    # pairs together, so a dead lane's original payload never propagates.
    propagated = _fill_forward(
        (jnp.where(is_pk, sk, EMPTY),) + tuple(smerged[:m_r])
    )
    pkey, prcols = propagated[0], propagated[1:]
    has = pkey != jnp.uint32(EMPTY)
    matched = has & (pkey == sk) & sside_fk & (sk != EMPTY)
    out_l = tuple(jnp.where(matched, smerged[k], 0) for k in range(m_l))
    out_r = tuple(jnp.where(matched, c, 0) for c in prcols)
    return jnp.where(matched, sk, 0), out_l, out_r, matched


@jax.jit
def join_shard_merge(
    left_fk: jnp.ndarray,
    left_payload: Tuple[jnp.ndarray, ...],
    right_pk: jnp.ndarray,
    right_payload: Tuple[jnp.ndarray, ...],
    left_valid: jnp.ndarray | None = None,
    right_valid: jnp.ndarray | None = None,
):
    """Merge-join variant of join_shard_fused: sort each side separately
    (skipping the build side when it is detected already sorted — clustered
    PKs) and probe with the streaming merge kernel (ops/merge_pallas.py).
    Two n-row sorts + a ~1-pass merge beat one (n_l+n_r)-row sort even when
    both sorts run, and halve the cost when the pk side arrives sorted.

    Output: one row per LEFT row in key-sorted order, padded with a
    ``matched`` mask (same consumption contract as join_shard_fused).
    TPU-only (the merge kernel); callers fall back to join_shard_fused
    elsewhere.
    """
    from .merge_pallas import merge_probe_pallas

    _check_32bit_payloads(left_payload, right_payload)
    fk = left_fk.astype(jnp.uint32)
    pk = right_pk.astype(jnp.uint32)
    if left_valid is not None:
        fk = jnp.where(left_valid, fk, EMPTY)
    if right_valid is not None:
        pk = jnp.where(right_valid, pk, EMPTY)

    sorted_l = jax.lax.sort(
        [fk] + [c.astype(jnp.uint32) for c in left_payload], num_keys=1
    )
    lk_s, lps_s = sorted_l[0], tuple(sorted_l[1:])

    is_sorted = jnp.all(pk[1:] >= pk[:-1])

    def keep(args):
        return args

    def dosort(args):
        k, ps = args
        out = jax.lax.sort([k, *ps], num_keys=1)
        return out[0], tuple(out[1:])

    rk_s, rps_s = jax.lax.cond(
        is_sorted, keep, dosort,
        (pk, tuple(c.astype(jnp.uint32) for c in right_payload)),
    )

    has, pkey, ppays = merge_probe_pallas(lk_s, rk_s, tuple(rps_s))
    matched = has & (pkey == lk_s) & (lk_s != EMPTY)
    out_r = tuple(jnp.where(matched, p, 0) for p in ppays)
    out_l = tuple(jnp.where(matched, p, 0) for p in lps_s)
    return jnp.where(matched, lk_s, 0), out_l, out_r, matched


def join_shard_auto(
    left_fk,
    left_payload,
    right_pk,
    right_payload,
    keys31: bool = False,
    pk_sorted: bool = False,
):
    """Single-shard join with host-detected workload structure:

      pk_sorted & keys31 -> sorted-build bitonic-merge join
          (ops/merge_xla.py): sort(n_l) + log2(N)-stage merge instead of
          sort(n_l+n_r). The reference's sequential-index pk
          (generator.cc:59-71) always takes this path.
      keys31 -> side packs into the sort key (one fewer live sort operand).
      otherwise -> the generic fused co-sort join.

    Operators detect both flags on the host-resident key columns (numpy
    scans in Prepare); measured on v5e at 2Mi x 2Mi: 5.5ms / 8.0ms / 9.0ms
    for the three tiers."""
    if pk_sorted and keys31:
        from .merge_xla import join_shard_sorted_build

        return join_shard_sorted_build(
            left_fk, left_payload, right_pk, right_payload
        )
    return join_shard_fused(
        left_fk, left_payload, right_pk, right_payload, keys31=keys31
    )


@partial(jax.jit, static_argnames=("impl",))
def probe_indices(
    left_fk: jnp.ndarray,
    right_pk: jnp.ndarray,
    right_valid: jnp.ndarray | None = None,
    left_valid: jnp.ndarray | None = None,
    impl: str = "cosort",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each left row, the right row index holding its pk (the
    selection_indices_vector of hash_probe.c) plus a found mask."""
    n_right = right_pk.shape[0]
    if impl == "cosort":
        return _cosort_probe(left_fk, right_pk, right_valid, left_valid)
    if impl == "cuckoo":
        cap = table_capacity(n_right, FLAGS.ht_load_factor)
        rows = jax.lax.broadcasted_iota(jnp.uint32, (n_right,), 0)
        table = ht_build(right_pk, rows, cap, valid=right_valid)
        sel, found = ht_probe(table, left_fk)
        # A non-converged build has silently dropped keys; force a visibly
        # empty result instead of partially-wrong matches (the reference
        # asserts the equivalent, hash_build.c:31).
        found = found & table.ok
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
    impl: str = "cosort",
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
