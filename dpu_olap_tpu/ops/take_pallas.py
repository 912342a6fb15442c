"""Pallas TPU kernel: streaming gather of sorted indices (the take fast path).

take(data, indices) = data[indices] with random uint32 indices. XLA's gather
engine is index-rate-bound on v5e (141M idx/s element-granular; row gathers
hit a table-size cliff: 383M rows/s at <=8MB, 88M at 16MB) and sorted inputs
do NOT help it (measured identical, MEASURE_R3.json rowgather_order) — so the
round-3 design removes random access from the hot path entirely:

  1. sort (idx, pos=iota) by idx           bitonic tree sort, 0.53ms/512Ki
  2. gather_sorted_pallas (this kernel)    one streaming pass over the table
  3. sort (pos, val) by pos                restores original order, 0.53ms

Kernel shape: a sequential grid walks table slices of ``slice_rows``x128
values while an SMEM cursor tracks how many sorted queries have been
consumed. Each step DMAs a fixed ``window_rows``x128 window of the sorted
index stream at the cursor, counts the run belonging to its slice (sorted =>
the run is contiguous at the cursor), selects each query's table row with a
compile-time unrolled select tree, and extracts its lane with ONE per-lane
dynamic gather — Mosaic lowers ``jnp.take_along_axis(..., axis=1)`` natively
at roughly one VPU pass per call (~6-9 us per 2Mi elements, parity-verified
against interpret mode; MEASURE_FILTER.json ops.lane_gather — the round-3
MEASURE_R3 take2.lanegather cells were DCE-poisoned and are flagged
suspect) — then writes the value
window back aligned with the query stream (output value j pairs with sorted
query j, so the final sort needs no extra payload plane). The partial first
row is merged from a carried last-row register instead of a read-modify-write
DMA.

Window overflow (a slice whose run exceeds the window — impossible for
uniform indices with the default 4x slack, possible for adversarially
clustered ones) sets a flag output; results are then invalid and the caller
retries with a doubled window (the cell-doubling skew-retry pattern of
operators/join_op.py).

Reference: dpu/shared/kernels/take.c:27-41 — tasklets stream index blocks
through WRAM and issue one 4-byte random MRAM load per index. The TPU
restatement streams the table exactly once at HBM bandwidth and turns every
random access into a sort or a sequential scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sort_pallas import sort_bitonic, sortable_bitonic

LANES = 128
DEF_SLICE_ROWS = 32  # table slice per grid step: 4Ki values (16KB)
DEF_WINDOW_ROWS = 16  # fallback query window when shapes are unknown
# Window ceiling: the double-buffered query+value windows live in scoped
# VMEM and Mosaic's per-kernel budget is 16MB — wr=1024 at the BM_Take
# shape failed to compile ("Scoped allocation ... exceeded scoped vmem
# limit", round-4 take4 campaign). Windows past this cap cannot help
# anyway (the run they'd cover exceeds any uniform distribution's tail);
# callers fall back to the row-gather path instead.
MAX_WINDOW_ROWS = 256


def default_window_rows(
    n_data: int, n_idx: int, slice_rows: int = DEF_SLICE_ROWS
) -> int:
    """Smallest safe sorted-query window for uniform indices: the mean
    query count per table slice plus 4-sigma Poisson slack, in 128-lane
    rows (multiple of 8 for sublane alignment). The select-tree work scales
    with the window, so tight windows win big — measured on v5e
    (MEASURE_R3.json dense section): the 2Mi dense join runs 791M rows/s at
    wr=32-40 vs 572M at the old 4x-mean heuristic's 128. Clustered indices
    overflow and retry with a doubled window (the operators' skew pattern)."""
    blk = slice_rows * LANES
    mean_q = n_idx * blk / max(n_data, blk)
    slots = mean_q + 4.0 * mean_q ** 0.5 + 1.0
    rows = -(-int(slots) // LANES)
    return min(MAX_WINDOW_ROWS, max(8, -(-rows // 8) * 8))


def _signed(k):
    # uint32 order mapped bit-exactly onto int32 order (Mosaic has no
    # unsigned compares; same-width astype is a bitcast)
    return (k ^ jnp.uint32(0x80000000)).astype(jnp.int32)


def _gather_kernel(
    slice_rows, window_rows, x_ref, sidx_ref, out_ref, flag_ref,
    qbuf, vbuf, lastrow, cur_ref, ovf_ref, sem_in, sem_out,
):
    b = pl.program_id(0)
    lo = (b * (slice_rows * LANES)).astype(jnp.uint32)
    par = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        cur_ref[0] = 0
        ovf_ref[0] = 0
        lastrow[...] = jnp.zeros((1, LANES), jnp.uint32)
        # bootstrap the double-buffered query stream: step 0's window
        pltpu.make_async_copy(
            sidx_ref.at[pl.ds(0, window_rows)], qbuf.at[0], sem_in
        ).start()

    cursor = cur_ref[0]
    row0 = jax.lax.div(cursor, LANES)
    phase = jax.lax.rem(cursor, LANES)

    # window of sorted queries at the cursor (row-granular DMA; the sub-row
    # phase is masked below). Caller pads sidx with window_rows extra rows of
    # 0xFFFFFFFF so this never reads out of bounds. The copy into qbuf[par]
    # was issued LAST step (bootstrap above for b == 0) so its latency
    # overlapped that step's select tree and output write.
    pltpu.make_async_copy(
        sidx_ref.at[pl.ds(row0, window_rows)], qbuf.at[par], sem_in
    ).wait()

    q = qbuf[par]
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, q.shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    )
    shi = _signed(lo + jnp.uint32(slice_rows * LANES))
    sq = _signed(q)
    mine = (flat >= phase) & (sq < shi)  # q >= lo: smaller were consumed
    c = jnp.sum(mine.astype(jnp.int32))
    ncur = cursor + c
    cur_ref[0] = ncur

    # the next step's cursor is now known: issue its query window into the
    # OTHER buffer so the DMA rides under this step's gather/select/write
    @pl.when(b + 1 < pl.num_programs(0))
    def _():
        pltpu.make_async_copy(
            sidx_ref.at[pl.ds(jax.lax.div(ncur, LANES), window_rows)],
            qbuf.at[1 - par],
            sem_in,
        ).start()

    # per slice row: gather that row at every query's lane (Mosaic lowers the
    # lane-axis take_along_axis natively), then a radix select tree on the
    # rowsel bits combines the per-row gathers — log2(slice_rows) select
    # levels (31+5 ops for 32 rows) instead of a linear compare+select chain
    # (64 ops). The gathers must precede the selects — a slot's value is
    # slice[rowsel[slot], lane[slot]], and gathering after a slot-wise row
    # select would read the row chosen by a DIFFERENT slot. Garbage slots
    # (consumed / future queries) land outside [cursor, cursor+c) and are
    # overwritten by later steps or sliced off.
    local = q - lo
    rowsel = (local >> 7).astype(jnp.int32)
    lane = (local & jnp.uint32(LANES - 1)).astype(jnp.int32)
    level = [
        jnp.take_along_axis(
            jnp.broadcast_to(x_ref[r : r + 1, :], q.shape), lane, axis=1
        )
        for r in range(slice_rows)
    ]
    bit = 1
    while len(level) > 1:
        pick = (rowsel & bit) != 0
        level = [
            jnp.where(pick, level[i + 1], level[i])
            for i in range(0, len(level), 2)
        ]
        bit <<= 1
    val = level[0]

    # merge the partial first row from the carried previous-step content
    lane_i = jax.lax.broadcasted_iota(jnp.int32, val.shape, 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, val.shape, 0)
    val = jnp.where((row_i == 0) & (lane_i < phase), lastrow[:], val)

    # carry the row holding the new cursor for the next step's merge. When
    # the new cursor is row-aligned just past the window, next phase is 0 and
    # the carry is never read.
    nrow = jnp.minimum(jax.lax.div(ncur, LANES) - row0, window_rows - 1)
    # int32 view for the selection-sum (Mosaic has no unsigned reductions);
    # exactly one row is selected so the sum is that row bit-exactly
    lastrow[:] = jnp.sum(
        jnp.where(row_i == nrow, val, jnp.uint32(0)).astype(jnp.int32),
        axis=0,
        keepdims=True,
    ).astype(jnp.uint32)

    # Overlapped output append: the previous step's write must complete
    # first (it shares the partial boundary row, whose merged content THIS
    # buffer carries — the writes must land in step order), then this one
    # rides under the next step's query read + select tree.
    @pl.when(b > 0)
    def _():
        pltpu.make_async_copy(
            vbuf.at[1 - par], out_ref.at[pl.ds(0, window_rows)], sem_out
        ).wait()
    vbuf[par] = val
    pltpu.make_async_copy(
        vbuf.at[par], out_ref.at[pl.ds(row0, window_rows)], sem_out
    ).start()

    # overflow: the window's last entry still belongs to this slice => the
    # run may continue beyond the window and results are invalid.
    last = jnp.sum(
        jnp.where(
            (row_i == window_rows - 1) & (lane_i == LANES - 1), sq, jnp.int32(0)
        )
    )
    ovf_ref[0] = ovf_ref[0] | (last < shi).astype(jnp.int32)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        pltpu.make_async_copy(
            vbuf.at[par], out_ref.at[pl.ds(row0, window_rows)], sem_out
        ).wait()
        flag_ref[0] = ovf_ref[0]


@functools.partial(
    jax.jit, static_argnames=("slice_rows", "window_rows", "interpret")
)
def gather_sorted_pallas(
    data: jnp.ndarray,
    sidx: jnp.ndarray,
    slice_rows: int = DEF_SLICE_ROWS,
    window_rows: int = DEF_WINDOW_ROWS,
    interpret: bool = False,
):
    """val[j] = data[sidx[j]] for ASCENDING-sorted uint32 sidx.

    Returns (val, overflow): val is garbage wherever sidx >= len(data) (such
    queries are never consumed; keep them at the sorted tail via 0xFFFFFFFF)
    and everywhere if overflow != 0 (retry with a larger window)."""
    n = data.shape[0]
    k = sidx.shape[0]
    blk = slice_rows * LANES
    assert n % blk == 0, f"n={n} must be a multiple of {blk}"
    assert k % LANES == 0, f"k={k} must be a multiple of {LANES}"
    krows = k // LANES

    sidx_p = jnp.concatenate(
        [
            sidx.reshape(krows, LANES),
            jnp.full((window_rows, LANES), 0xFFFFFFFF, jnp.uint32),
        ]
    )
    out, flag = pl.pallas_call(
        functools.partial(_gather_kernel, slice_rows, window_rows),
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec(
                (slice_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((krows + window_rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, LANES), jnp.uint32),  # query windows (2x: lookahead)
            pltpu.VMEM((2, window_rows, LANES), jnp.uint32),  # value windows (2x: async write)
            pltpu.VMEM((1, LANES), jnp.uint32),  # carried partial row
            pltpu.SMEM((1,), jnp.int32),  # consumed-query cursor
            pltpu.SMEM((1,), jnp.int32),  # overflow accumulator
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: cursor carry
        ),
        interpret=interpret,
    )(data.reshape(n // LANES, LANES), sidx_p)
    return out[:krows].reshape(k), flag[0]


def takeable_sorted(n_data: int, n_idx: int) -> bool:
    """Shape gate for take_sorted: both sorts must clear the bitonic floor
    and the table must tile into 128-lane rows."""
    return (
        sortable_bitonic(n_idx)
        and n_data % LANES == 0
        and n_data >= LANES * DEF_SLICE_ROWS
    )


def _stream_take(data, indices, window_rows, interpret):
    """Shared sort->stream core: returns (spos, val, flag, k) over the
    power-of-two padded query stream (length npow >= k). spos is an exact
    permutation of 0..npow-1; pads carry key 0xFFFFFFFF (> any clipped real
    query, so they occupy exactly the tail slots [k, npow))."""
    n = data.shape[0]
    k = indices.shape[0]
    if window_rows is None:
        window_rows = default_window_rows(n, k)
    blk = DEF_SLICE_ROWS * LANES
    npad = (-n) % blk
    if npad:
        data = jnp.concatenate([data, jnp.zeros((npad,), data.dtype)])
    # pad the queries to the sort's power-of-two length OURSELVES with pos
    # keys k..N-1 (monotone, distinct): sort_bitonic then pads nothing, so
    # no anonymous pad payloads can interleave with the real 0xFFFFFFFF-key
    # pad queries and displace real pos entries through the restore sort
    # (round-3 review finding: a pad pos of 0 shifted every output element
    # for any non-power-of-two padded k). spos is then an exact permutation
    # of 0..N-1, the restore sort puts pads at [k, N), and [:k] is exact.
    npow = 1 << (k - 1).bit_length()
    idxc = jnp.minimum(indices.astype(jnp.uint32), jnp.uint32(n - 1))
    pos = jnp.arange(npow, dtype=jnp.uint32)
    if npow != k:
        # pad queries sort to the tail (clipped >= n is never consumed)
        idxc = jnp.concatenate(
            [idxc, jnp.full((npow - k,), 0xFFFFFFFF, jnp.uint32)]
        )
    sidx, spos = sort_bitonic((idxc, pos), interpret=interpret)
    bits = (
        data
        if data.dtype == jnp.uint32
        else jax.lax.bitcast_convert_type(data, jnp.uint32)
    )
    val, flag = gather_sorted_pallas(
        bits, sidx, window_rows=window_rows, interpret=interpret
    )
    return spos, val, flag, k


@functools.partial(
    jax.jit, static_argnames=("window_rows", "interpret")
)
def take_sorted(
    data: jnp.ndarray,
    indices: jnp.ndarray,
    window_rows: int | None = None,
    interpret: bool = False,
):
    """out[i] = data[indices[i]] (clip semantics), plus an overflow flag.

    The jitted sort->stream->sort pipeline. The flag is 0 whenever no table
    slice's query run overflowed the window; callers that cannot bound index
    clustering check it host-side and retry with window_rows*2 (TakeTpu), or
    pre-size the window from the index distribution (benchmarks)."""
    spos, val, flag, k = _stream_take(data, indices, window_rows, interpret)
    _, out = sort_bitonic((spos, val), interpret=interpret)
    out = out[:k]
    if data.dtype != jnp.uint32:
        out = jax.lax.bitcast_convert_type(out, data.dtype)
    return out, flag


@functools.partial(
    jax.jit, static_argnames=("window_rows", "interpret")
)
def take_sorted_stream(
    data: jnp.ndarray,
    indices: jnp.ndarray,
    window_rows: int | None = None,
    interpret: bool = False,
):
    """Order-free take: (pos, val, flag) in ASCENDING-index stream order.

    val[j] = data[sorted(indices)[j]] (clip semantics) and pos[j] is that
    query's original position, both length k — the restore sort that
    take_sorted pays to put values back in query order (~1/3 of its
    end-to-end time at the BM_Take shape, the round-4 'bookend-sort tax')
    is skipped. Consumers that aggregate, feed another sort, or can scatter
    lazily (out = zeros.at[pos].set(val)) take this entry point; order-
    dependent consumers use take_sorted. flag semantics match take_sorted.

    Reference: dpu/shared/kernels/take.c:27-41 emits output in query order
    because MRAM random loads are order-free; on TPU order itself is the
    expensive part, so the contract splits."""
    spos, val, flag, k = _stream_take(data, indices, window_rows, interpret)
    # pads (key 0xFFFFFFFF) sort strictly after clipped real queries (< n),
    # so the first k stream slots are exactly the real queries
    out = val[:k]
    if data.dtype != jnp.uint32:
        out = jax.lax.bitcast_convert_type(out, data.dtype)
    return spos[:k], out, flag
