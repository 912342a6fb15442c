"""XLA bitonic merge of two sorted runs + the sorted-build co-sort join.

Motivation (MEASURE_R2.json): a flat 4Mi 2-operand XLA sort costs 7.2ms on
v5e; when the build (pk) side arrives already sorted — always true for the
reference's sequential index pk (host/generator/generator.cc:59-71) — the
concat of [sorted_pk | reversed(sorted_fk)] is a bitonic sequence, and one
log2(N)-stage bitonic merge network replaces the flat co-sort. Each stage is
a pure elementwise min/max + select pass that XLA fuses aggressively, so the
merge costs ~log2(N) bandwidth passes instead of a full sort.

The probe side still needs one sort (half the data of the concat sort), so
the sorted-build join = sort(n_l) + merge(n_l+n_r) versus sort(n_l+n_r).

Reference analog: the DPU join exploits nothing about sorted builds (it
always hash-builds, dpu/shared/kernels/hash_build.c); this path is a
TPU-native specialization the detected-sorted operator selects.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_merge(planes: Tuple[jnp.ndarray, ...], interpret: bool = False):
    """Sort a BITONIC sequence (e.g. concat of an ascending and a descending
    sorted run) with the classic half-cleaner cascade. planes[0] is the key
    (uint32, ties interchangeable); other planes follow its moves. Length
    must be a power of two (callers pad with 0xFFFFFFFF keys).

    Stage split (measured — a naive per-stage XLA loop costs 36.7ms at 4Mi
    because sub-128 distances force sub-lane-width layouts; XLA slice/concat
    passes for d >= BLOCK cost ~1.0ms at 4Mi as 6 full HBM materializations,
    MEASURE_MERGE.json): stages with d >= BLOCK fuse into ONE Pallas pass
    (ops/sort_pallas.bitonic_xblock — whole-block compare-exchange, VMEM
    resident); all stages with d < BLOCK fuse into another
    (ops/bitonic_pallas.py)."""
    from .bitonic_pallas import DEF_R, bitonic_merge_blocks
    from .sort_pallas import bitonic_xblock

    n = planes[0].shape[0]
    assert n & (n - 1) == 0, f"bitonic_merge needs power-of-2 length, got {n}"
    block = DEF_R * 128
    if n > block:
        planes = bitonic_xblock(
            tuple(planes), seg_len=n, low_d=block, interpret=interpret
        )
    if n >= block:
        return bitonic_merge_blocks(tuple(planes), interpret=interpret)
    planes = list(planes)
    # tiny inputs: finish with a plain sort (test-scale only)
    out = jax.lax.sort(planes, num_keys=1)
    return tuple(out)


@partial(jax.jit, static_argnames=("pk_sorted",))
def join_shard_sorted_build(
    left_fk: jnp.ndarray,
    left_payload: Tuple[jnp.ndarray, ...],
    right_pk: jnp.ndarray,
    right_payload: Tuple[jnp.ndarray, ...],
    pk_sorted: bool = True,
):
    """Co-sort join for a SORTED (or to-be-sorted-once) unique-pk build side
    with 31-bit keys: sort the probe side only, bitonic-merge the two runs,
    then the standard fill + mask. Same output contract as join_shard_fused
    (padded key-sorted rows + matched mask); like it, payload k of both
    sides shares one merged plane. keys < 2^31 - 1 (keys31 contract).
    """
    from .hashtable import EMPTY
    from .join import _fill_forward

    n_r, n_l = right_pk.shape[0], left_fk.shape[0]
    m_l, m_r = len(left_payload), len(right_payload)
    m = max(m_l, m_r)
    pk = right_pk.astype(jnp.uint32)
    fk = left_fk.astype(jnp.uint32)
    xs = [
        right_payload[k].astype(jnp.uint32) if k < m_r
        else jnp.zeros((n_r,), jnp.uint32)
        for k in range(m)
    ]
    ys = [
        left_payload[k].astype(jnp.uint32) if k < m_l
        else jnp.zeros((n_l,), jnp.uint32)
        for k in range(m)
    ]

    # Probe-side sort: the Pallas bitonic merge-tree sort beats the flat XLA
    # sort ~2x on v5e (ops/sort_pallas.py docstring) whenever the shape is
    # eligible; ties (equal fks) may permute payloads — interchangeable rows
    # under the padded key-sorted output contract.
    from .filter import _on_tpu
    from .sort_pallas import sort_bitonic, sortable_bitonic

    def _sort(ops):
        if _on_tpu() and sortable_bitonic(ops[0].shape[0]):
            return list(sort_bitonic(tuple(ops)))
        return jax.lax.sort(ops, num_keys=1)

    k2_l = (fk << jnp.uint32(1)) | jnp.uint32(1)
    sorted_l = _sort([k2_l, *ys])
    sl_k, sl_ys = sorted_l[0], sorted_l[1:]
    k2_r = pk << jnp.uint32(1)
    if not pk_sorted:
        sorted_r = _sort([k2_r, *xs])
        k2_r, xs = sorted_r[0], list(sorted_r[1:])

    n = n_r + n_l
    pad = (1 << (n - 1).bit_length()) - n
    # [ascending pk run | descending fk run] = bitonic; pad (max-key) lanes
    # sit between the runs' peak so the sequence stays bitonic.
    zk = jnp.concatenate(
        [k2_r, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32), sl_k[::-1]]
    )
    zps = [
        jnp.concatenate([x, jnp.zeros((pad,), jnp.uint32), sy[::-1]])
        for x, sy in zip(xs, sl_ys)
    ]
    merged = bitonic_merge((zk, *zps))
    sk2, sms = merged[0], merged[1:]
    sk = sk2 >> jnp.uint32(1)
    is_pk = (sk2 & jnp.uint32(1)) == 0
    sk = jnp.where(sk2 >= jnp.uint32(0xFFFFFFFE), EMPTY, sk)

    propagated = _fill_forward(
        (jnp.where(is_pk, sk, EMPTY),) + tuple(sms[:m_r])
    )
    pkey, prcols = propagated[0], propagated[1:]
    has = pkey != jnp.uint32(EMPTY)
    matched = has & (pkey == sk) & (~is_pk) & (sk != EMPTY)
    out_l = tuple(jnp.where(matched, sms[k], 0) for k in range(m_l))
    out_r = tuple(jnp.where(matched, c, 0) for c in prcols)
    return jnp.where(matched, sk, 0), out_l, out_r, matched


def dense_window_rows(n_l: int, n_r: int) -> int:
    """Default gather window: mean queries-per-slice + 4-sigma Poisson slack
    (take_pallas.default_window_rows — measured-tight on v5e); adversarial
    fk clustering overflows and retries with a doubled window."""
    from .take_pallas import default_window_rows

    return default_window_rows(n_r, n_l)


def join_dense_eligible(n_l: int, n_r: int) -> bool:
    """The dense-pk gather join needs a tree-sortable probe and a table big
    enough for at least one gather slice."""
    from .sort_pallas import sortable_bitonic
    from .take_pallas import DEF_SLICE_ROWS

    return sortable_bitonic(n_l) and n_r >= DEF_SLICE_ROWS * 128


@partial(jax.jit, static_argnames=("window_rows", "slice_rows", "interpret"))
def join_shard_dense(
    left_fk: jnp.ndarray,
    left_payload: Tuple[jnp.ndarray, ...],
    right_pk: jnp.ndarray,
    right_payload: Tuple[jnp.ndarray, ...],
    window_rows: int | None = None,
    slice_rows: int | None = None,
    interpret: bool = False,
):
    """Join against a DENSE pk column (pk[i] = pk[0] + i, verified host-side
    by the operator — always true for the reference generator's sequential
    index pk, host/generator/generator.cc:59-71): the probe is a positional
    gather, so the whole merge+propagate machinery of the co-sort join
    collapses into sort(probe) + ONE streaming pass over each build payload
    column (ops/take_pallas.gather_sorted_pallas).

    Output contract matches join_shard_fused (key-sorted rows + matched
    mask), but with exactly n_l rows instead of n_l+n_r+pad — unmatched fks
    (outside the pk range) are zeroed and masked out. Returns
    (key, out_l, out_r, matched, overflow): overflow != 0 means a gather
    window overflowed (extreme fk clustering) and the caller must retry with
    window_rows*2 (TakeTpu/JoinTpu skew-retry pattern)."""
    from .filter import _on_tpu
    from .sort_pallas import sort_bitonic, sortable_bitonic
    from .take_pallas import DEF_SLICE_ROWS, gather_sorted_pallas

    n_r, n_l = right_pk.shape[0], left_fk.shape[0]
    if slice_rows is None:
        slice_rows = DEF_SLICE_ROWS
    if window_rows is None:
        from .take_pallas import default_window_rows

        window_rows = default_window_rows(n_r, n_l, slice_rows)
    lo = right_pk[0].astype(jnp.uint32)
    idx = left_fk.astype(jnp.uint32) - lo  # out-of-range wraps huge, masked

    ys = [p.astype(jnp.uint32) for p in left_payload]
    if (_on_tpu() or interpret) and sortable_bitonic(n_l):
        sorted_ = list(sort_bitonic((idx, *ys), interpret=interpret))
    else:
        sorted_ = list(jax.lax.sort([idx, *ys], num_keys=1))
    sidx, sys_ = sorted_[0], sorted_[1:]

    matched = sidx < jnp.uint32(n_r)
    blk = slice_rows * 128
    npad = (-n_r) % blk
    kpad = (-n_l) % 128
    sidx_cl = jnp.minimum(sidx, jnp.uint32(n_r - 1))
    if kpad:
        # clip-max padding keeps the stream sorted; sliced back below
        sidx_cl = jnp.concatenate(
            [sidx_cl, jnp.full((kpad,), n_r - 1, jnp.uint32)]
        )
    overflow = jnp.int32(0)
    out_r = []
    for x in right_payload:
        xx = x.astype(jnp.uint32)
        if npad:
            xx = jnp.concatenate([xx, jnp.zeros((npad,), jnp.uint32)])
        val, f = gather_sorted_pallas(
            xx, sidx_cl, slice_rows=slice_rows, window_rows=window_rows,
            interpret=interpret,
        )
        overflow = overflow | f
        out_r.append(jnp.where(matched, val[:n_l], 0))

    key = jnp.where(matched, sidx + lo, 0)
    out_l = tuple(jnp.where(matched, y, 0) for y in sys_)
    return key, out_l, tuple(out_r), matched, overflow
