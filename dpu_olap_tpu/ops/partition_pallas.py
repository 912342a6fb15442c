"""Pallas TPU kernel: radix hash-partition into padded cells.

The fused device-side form of parallel/shuffle.local_fragments — partitions a
column (plus payload columns and generated selection indices) by the Wang
radix bucket directly into the (P, cell) fragment layout the all-to-all
shuffle consumes, in ONE pass over HBM. Replaces the XLA path's stable sort
(~17.5ms for 2Mi at P=8 on v5e).

Reference: dpu/shared/kernels/partition.c — histogram + prefix sum + mutex-
guarded scatter with per-bucket single-element write-combining caches for
DMA alignment (:150-264). TPU-natively each grid block runs one butterfly
concentration per bucket (the filter kernel's routing network with
mask = bucket==p), appending to that bucket's cell at a running SMEW offset;
the per-bucket write-combining cache becomes the lane-phase read-modify-write
of the cell's partial row, and writes go out in chunked row-aligned DMAs
sized to the fragment (no P-fold write amplification).

Constraints: P power of two <= 16 (the per-bucket butterflies are unrolled);
cell_size a multiple of 128; n a multiple of block_rows*128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filter_pallas import (
    LANES,
    _inclusive_scan_rowmajor,
    _lane_iota,
    _row_iota,
    run_butterfly,
)
from .hashing import wang_hash

DEF_R = 256  # rows per block (32Ki elements)
WCHUNK = 32  # rows per write DMA chunk (16KB)
# Landing-strip rows: one WCHUNK so the working planes are chunk-aligned and
# the chunked writes can cover the worst case (full-bucket block + phase).
SKEW = WCHUNK


def _partition_kernel(
    p_parts, n_pay, shift, cell_rows, region_rows,
    x_ref, *refs,
):
    # refs layout:
    #   payload in refs[0:n_pay]
    #   outputs: cells_k, cells_pay*..., counts, overflow
    #   scratch: work planes (2 + n_pay + 1), rowbuf x (1+n_pay+1), offs, ovf, sem
    n_planes = 2 + n_pay  # values, selection-index, payloads
    pay_in = refs[:n_pay]
    out_k = refs[n_pay]
    out_pay = refs[n_pay + 1 : n_pay + 1 + n_pay]
    out_sel = refs[n_pay + 1 + n_pay]
    counts_ref = refs[n_pay + 2 + n_pay]
    sc = list(refs[n_pay + 3 + n_pay :])
    work = sc[:n_planes]  # uint32 planes: key, sel, pays
    work_d = sc[n_planes]
    rowbufs = sc[n_planes + 1 : 2 * n_planes + 1]
    offs = sc[2 * n_planes + 1]  # SMEM (P,)
    ovf = sc[2 * n_planes + 2]  # SMEM (1,)
    sem = sc[2 * n_planes + 3]

    i = pl.program_id(0)
    r = x_ref.shape[0]
    wrows = r + SKEW

    @pl.when(i == 0)
    def _():
        for p in range(p_parts):
            offs[p] = 0
        ovf[0] = 0

    blk = x_ref[:]
    pays = [p[:] for p in pay_in]
    # wang_hash is the single shared implementation (ops/hashing.py): the
    # shuffle bucket here MUST stay bit-identical to the XLA-path bucket or
    # co-partitioning of the two join sides silently breaks.
    bucket = (wang_hash(blk) >> jnp.uint32(shift)).astype(jnp.int32)
    flat = _row_iota((r, LANES)) * LANES + _lane_iota((r, LANES))
    # the selection-index payload (each element's global row) is generated
    # by the packed routing below: local flat index rides the distance word

    outs = [out_k, out_sel, *out_pay]

    for p in range(p_parts):
        mask = (bucket == p).astype(jnp.int32)
        cnt = jnp.sum(mask)
        # Clamp the append offset to the cell bound: once a cell overflows
        # (flag set below) later blocks must not DMA past the allocated
        # region — out-of-bounds DMA behavior on hardware is undefined.
        off = jnp.minimum(offs[p], cell_rows * LANES)
        phase = jax.lax.rem(off, LANES)
        row0 = jax.lax.div(off, LANES)

        prefix = _inclusive_scan_rowmajor(mask)
        d_blk = jnp.where(mask == 1, flat + SKEW * LANES - (prefix - 1 + phase), 0)

        # packed-plane routing (round 4, run_butterfly dshift form): the
        # selection index rides the distance word's low 15 bits instead of
        # being its own routed plane — one less plane through every one of
        # the P per-bucket butterflies. Needs (r + SKEW) * 128 < 2^16.
        planes = [blk, *pays]
        routed = [work[0], *work[2:]]
        for w, pv in zip(routed, planes):
            w[pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.uint32)
            w[pl.ds(SKEW, r)] = pv
        work_d[pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.int32)
        work_d[pl.ds(SKEW, r)] = (d_blk << 15) | flat

        run_butterfly(routed, work_d, wrows, dshift=15)
        work[1][...] = (work_d[...] & 0x7FFF).astype(jnp.uint32) + jnp.uint32(
            i * (r * LANES)
        )

        # merge this cell's shared partial row, then chunked append
        for k in range(n_planes):
            rd = pltpu.make_async_copy(
                outs[k].at[p, pl.ds(row0, 1)], rowbufs[k], sem
            )
            rd.start()
            rd.wait()
            lane1 = _lane_iota((1, LANES))
            first = jnp.where(lane1 < phase, rowbufs[k][:], work[k][pl.ds(0, 1)])
            work[k][pl.ds(0, 1)] = first

        # rows holding data: ceil((phase+cnt)/128), written in WCHUNK chunks
        nrows = jax.lax.div(phase + cnt + (LANES - 1), LANES)
        max_chunks = (r + SKEW) // WCHUNK  # covers nrows <= r+1 exactly
        for j in range(max_chunks):
            @pl.when(j * WCHUNK < nrows)
            def _(j=j):
                for k in range(n_planes):
                    wr = pltpu.make_async_copy(
                        work[k].at[pl.ds(j * WCHUNK, WCHUNK)],
                        outs[k].at[p, pl.ds(row0 + j * WCHUNK, WCHUNK)],
                        sem,
                    )
                    wr.start()
                    wr.wait()

        offs[p] = off + cnt
        ovf[0] = ovf[0] | (offs[p] > cell_rows * LANES).astype(jnp.int32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        for p in range(p_parts):
            counts_ref[p] = offs[p]
        counts_ref[p_parts] = ovf[0]


@functools.partial(
    jax.jit, static_argnames=("nr_partitions", "cell_size", "block_rows", "interpret")
)
def partition_cells_pallas(
    keys: jnp.ndarray,
    payloads: tuple,
    nr_partitions: int,
    cell_size: int,
    block_rows: int = DEF_R,
    interpret: bool = False,
):
    """Partition keys (+payloads) into (P, cell) padded cells + counts.

    Returns (cells_k, cells_payloads tuple, cells_sel, counts, overflow) —
    the local_fragments contract plus a generated selection-index plane
    (each value's original row index, partition.c output (b)).
    """
    p_parts = nr_partitions
    assert p_parts & (p_parts - 1) == 0 and 2 <= p_parts <= 16
    assert cell_size % LANES == 0
    n = keys.shape[0]
    r = block_rows
    assert n % (r * LANES) == 0, f"n={n} not multiple of {r * LANES}"
    # packed sel-in-distance routing bound: (r + SKEW) * 128 < 2^16
    assert r <= 256, f"block_rows={r} > 256 breaks the packed-plane bound"
    nrows, nblocks = n // LANES, n // (r * LANES)
    shift = 1 + (32 - int(p_parts).bit_length())
    cell_rows = cell_size // LANES
    region_rows = cell_rows + r + SKEW + WCHUNK
    n_pay = len(payloads)
    n_planes = 2 + n_pay

    x = keys.reshape(nrows, LANES)
    pays = [p.reshape(nrows, LANES) for p in payloads]

    blocked = lambda: pl.BlockSpec((r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cells = lambda: jax.ShapeDtypeStruct((p_parts, region_rows, LANES), jnp.uint32)

    out = pl.pallas_call(
        functools.partial(
            _partition_kernel, p_parts, n_pay, shift, cell_rows, region_rows
        ),
        grid=(nblocks,),
        in_specs=[blocked()] + [blocked() for _ in range(n_pay)],
        out_shape=(
            cells(),  # keys
            *[cells() for _ in range(n_pay)],  # payloads
            cells(),  # selection indices
            jax.ShapeDtypeStruct((p_parts + 1,), jnp.int32),  # counts + ovf
        ),
        out_specs=(
            *[pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_pay + 2)],
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=(
            [pltpu.VMEM((r + SKEW, LANES), jnp.uint32) for _ in range(n_planes)]
            + [
                pltpu.VMEM((r + SKEW, LANES), jnp.int32),  # distances (<0 = hole)
            ]
            + [pltpu.VMEM((1, LANES), jnp.uint32) for _ in range(n_planes)]
            + [
                pltpu.SMEM((p_parts,), jnp.int32),  # running offsets
                pltpu.SMEM((1,), jnp.int32),  # overflow flag
                pltpu.SemaphoreType.DMA(()),
            ]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, *pays)

    cells_k = out[0][:, :cell_rows, :].reshape(p_parts, cell_size)
    cells_pay = tuple(
        o[:, :cell_rows, :].reshape(p_parts, cell_size) for o in out[1 : 1 + n_pay]
    )
    cells_sel = out[1 + n_pay][:, :cell_rows, :].reshape(p_parts, cell_size)
    counts = out[2 + n_pay][:p_parts].astype(jnp.uint32)
    overflow = out[2 + n_pay][p_parts] != 0
    return cells_k, cells_pay, cells_sel, counts, overflow
