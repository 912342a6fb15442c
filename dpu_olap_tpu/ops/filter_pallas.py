"""Pallas TPU kernel: single-pass stable filter compaction.

The speed-of-light replacement for the XLA scatter/sort compaction paths
(ops/filter.py) — those are dominated by XLA's element-granular scatter /
sort lowerings (measured ~1.5-2 GB/s on v5e); this kernel streams the column
once at HBM bandwidth.

Reference analog: dpu/shared/kernels/filter.c — tasklets compact per-block in
WRAM and chain running counts through handshakes so each writes its run at
the right global offset with aligned DMA (:28-55,100-131). Here the same
roles map TPU-natively:

  16 tasklets + handshake chain  -> sequential Pallas grid + SMEM running
                                    offset (TPU grid steps execute in order
                                    on the core, so the carry needs no locks)
  WRAM per-block compaction      -> VMEM butterfly concentration: each kept
                                    element's routing distance d = src - dst
                                    is decomposed in binary; level b shifts
                                    packets down 2^b lanes. Routing to
                                    monotone non-decreasing destinations is
                                    conflict-free through such a network
                                    (classic concentrator property), which
                                    the test suite verifies exhaustively.
  8B-aligned odd/even fix-ups    -> lane-phase alignment: each block shifts
                                    its output by (global_offset mod 128) and
                                    read-modify-writes the one partial row it
                                    shares with the previous block, then
                                    overwrites whole 128-lane rows; the next
                                    block's write reclaims the garbage tail.

Layout: input viewed as (rows, 128) uint32; block = R rows. Packets are
placed at rows SKEW..R+SKEW-1 of an (R+SKEW)-row working buffer (the skew
keeps all routing distances positive even at phase 127; SKEW=8 keeps the
scratch sublane-aligned) and butterfly-routed to q = prefix(kept)-1 + phase.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# rows per block: v5e e2e sweep r64/128/256/512 -> 18/30/40/45 GB/s at the
# HBM-honest 64Mi scale (MEASURE_FILTER.json e2e) — fixed per-block costs
# amortize through r512; r1024's extra level loses slightly.
DEF_R = 512
WCHUNK = 32  # rows per output-write DMA chunk (16KB)
# Landing-strip rows: one WCHUNK so the working buffer is chunk-aligned and
# chunked data-proportional writes can cover the worst case (all-pass block
# + phase). Any SKEW*128 > 127 keeps routing distances positive.
SKEW = WCHUNK


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _scan_matrices(r, l=LANES):
    """The two constant operands of the MXU prefix scan: U = (l,l)
    upper-triangular ones (in-row inclusive prefix) and Lstrict = (r,r)
    strictly-lower-triangular ones (row-exclusive carry). Building these
    iota-compares costs real vector work — per-grid-step reconstruction was
    ~2x the matmuls themselves, so the kernel hoists them into VMEM scratch
    filled once at block 0 (_scan_init/_scan_hoisted)."""
    u = (
        jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    ).astype(jnp.bfloat16)
    lt = (
        jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    ).astype(jnp.bfloat16)
    return u, lt


def _scan_init(u_ref, lt_ref):
    u, lt = _scan_matrices(lt_ref.shape[0], u_ref.shape[0])
    u_ref[...] = u
    lt_ref[...] = lt


def _scan_hoisted(m, u_ref, lt_ref):
    """_inclusive_scan_rowmajor with the triangular operands read from
    scratch, and the row-carry computed as Lstrict @ (mask @ J) — three
    full-width MXU matmuls instead of the (R,R)@(R,1) column matmul, whose
    N=1 lowering was the scan's hot spot (Mosaic handles lane-1 tensors a
    full vreg-column at a time). Exactness: mask @ J entries <= 128 are
    bf16-exact; both accumulations are f32 and < 2^24."""
    l = m.shape[1]
    mb = m.astype(jnp.bfloat16)
    inrow = jax.lax.dot_general(
        mb, u_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ones = jnp.ones((l, l), jnp.bfloat16)
    rowtot = jax.lax.dot_general(
        mb, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # (R,128) row totals broadcast, <=128 exact
    excl = jax.lax.dot_general(
        lt_ref[...], rowtot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (inrow + excl).astype(jnp.int32)


def _inclusive_scan_rowmajor(m):
    """Inclusive prefix sum of a 0/1 int32 (R,128) mask in row-major
    flattened order, on the MXU: the in-row prefix is mask @ U (U = 128x128
    upper-triangular ones) and the row-exclusive part is Lstrict @ rowtotals
    — two small bf16 matmuls instead of 15 masked-roll VPU steps (measured
    2x the whole mask+scan pass on v5e, /tmp prototype -> DESIGN.md).

    Exactness: operands are 0/1 (and row totals <= 128, integers <= 256 are
    exact in bf16); f32 accumulation is exact below 2^24 >= R*128."""
    r, l = m.shape
    u = (
        jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    ).astype(jnp.bfloat16)
    lt = (
        jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    ).astype(jnp.bfloat16)
    mb = m.astype(jnp.bfloat16)
    inrow = jax.lax.dot_general(
        mb, u, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    tot = inrow[:, l - 1 :]  # (r, 1) row totals
    excl = jax.lax.dot_general(
        lt, tot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (inrow + excl).astype(jnp.int32)


def _shift_down(arr, s, rows):
    """result[q] = arr[q + s] over the row-major flattened (rows,128) array.
    Slots whose source is beyond the buffer receive wrapped garbage — callers
    mask (validity plane or hole-encoded distances)."""
    if s % LANES == 0:
        return pltpu.roll(arr, rows - (s // LANES), 0)  # roll by -s/128 rows
    a = pltpu.roll(arr, LANES - s, 1)  # within-row: arr[r, (l+s)%128]
    b = pltpu.roll(a, rows - 1, 0)  # next-row carry
    lane = _lane_iota(arr.shape)
    return jnp.where(lane + s < LANES, a, b)


def run_butterfly(work_planes, work_d, wrows, dshift: int = 0):
    """Concentrate packets held in ``work_planes`` (scratch refs) to their
    destinations: work_d holds each slot's remaining routing distance, with
    d == 0 marking holes AND placed packets (both mean "nothing to move" —
    the network never needs to tell them apart, and callers guarantee real
    packets start with d > 0 via the SKEW landing strip). Level b moves
    packets whose d-bit b is set down 2^b slots.

    The 0-encoding makes wrap-around reads self-masking, dropping the old
    in-range test and the cd >= 0 guard (2 vector ops/level): a slot q near
    the buffer end reads wrapped source position q + s - total < s, and ANY
    packet at a position p < s has d-bit s clear (p = dst + residual and a
    set bit s forces residual >= s, hence p >= s), so take is false there.
    Shared by the filter and partition kernels.

    dshift > 0 is the PACKED-PLANE form (round 4): work_d carries
    ``(d << dshift) | cargo`` — the distance field occupies bits
    [dshift, 31] and a per-packet cargo (e.g. its selection index, < 2^dshift)
    rides in the low bits, saving one full routed plane. Level bits test
    and subtract at the shifted position, so the cargo is never perturbed
    (a set distance bit makes ``cd - (s << dshift)`` borrow-free) and moves
    with its packet through the `take` select. Hole/placed encoding is the
    whole word == 0, which requires real packets to keep d > 0 until the
    final level — guaranteed by the SKEW landing strip exactly as in the
    unpacked form. Exactness bound: d < 2^(31 - dshift), i.e. block_rows
    <= 256 at dshift 15 ((256 + SKEW) * 128 < 2^16)."""
    total = wrows * LANES
    s = 1
    while s < total:
        se = s << dshift
        d = work_d[:]
        cd = _shift_down(d, s, wrows)
        # a set bit always moves its packet out (conflict-free network), so
        # no d >= 0 / hole guard is needed: holes and placed packets are 0.
        take = (cd & se) != 0
        for w in work_planes:
            v = w[:]
            w[:] = jnp.where(take, _shift_down(v, s, wrows), v)
        # with cargo packed in (dshift > 0) the final word must still be
        # written: the caller reads the cargo bits back out of work_d
        if s * 2 < total or dshift:
            work_d[:] = jnp.where(take, cd - se, jnp.where((d & se) == 0, d, 0))
        s *= 2


def _filter_kernel(threshold, with_indices, trace, x_ref, *refs):
    # refs: outputs (out, [sel_out], count), scratch (work_v, [work_s],
    # work_d, rowbuf, [rowbuf_s], off_ref, sem, u_mat, lt_mat)
    n_out = 2 if with_indices else 1
    outs = list(refs[:n_out])
    count_ref = refs[n_out]
    sc = list(refs[n_out + 1 :])
    works = sc[:n_out]
    work_d = sc[n_out]
    carries = sc[n_out + 1 : 2 * n_out + 1]
    off_ref = sc[2 * n_out + 1]
    sem = sc[2 * n_out + 2]
    u_ref, lt_ref = sc[2 * n_out + 3 : 2 * n_out + 5]

    i = pl.program_id(0)
    r = x_ref.shape[0]
    wrows = r + SKEW

    @pl.when(i == 0)
    def _():
        off_ref[0] = 0
        _scan_init(u_ref, lt_ref)
        for c in carries:
            c[...] = jnp.zeros((1, LANES), jnp.uint32)

    offset = off_ref[0]
    phase = jax.lax.rem(offset, LANES)
    row0 = jax.lax.div(offset, LANES)

    blk = x_ref[:]  # (R, 128) uint32
    mask = (blk < jnp.uint32(threshold)).astype(jnp.int32)

    # destination q = prefix-1 + phase over the (R+SKEW,128) working buffer;
    # packets start at row SKEW (skew SKEW*128 > 127), so d > 0 always.
    prefix = _scan_hoisted(mask, u_ref, lt_ref)
    cnt = prefix[r - 1, LANES - 1]  # inclusive total — no separate sum pass
    if trace:
        # device-side trace stream (reference trace(), shared/umq/log.h:13-17
        # with ENABLE_TRACE=1): per-block progress through the compaction
        pl.debug_print("filter block {} offset {} kept {}", i, offset, cnt)
    flat = _row_iota((r, LANES)) * LANES + _lane_iota((r, LANES))
    d_blk = jnp.where(mask == 1, flat + SKEW * LANES - (prefix - 1 + phase), 0)

    # lay into working planes (rows 0..SKEW-1 = empty landing strip)
    works[0][pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.uint32)
    works[0][pl.ds(SKEW, r)] = blk
    if with_indices:
        # packed-plane form (round 4): the selection index rides in the low
        # 15 bits of the distance word instead of as its own routed plane —
        # one fewer plane through all 16 levels (d < 2^16 needs r <= 256,
        # enforced by the wrapper). The cargo is extracted into works[1]
        # after routing, just in time for the shared RMW + DMA below.
        work_d[pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.int32)
        work_d[pl.ds(SKEW, r)] = (d_blk << 15) | flat
        run_butterfly(works[:1], work_d, wrows, dshift=15)
        works[1][...] = (work_d[...] & 0x7FFF).astype(jnp.uint32) + jnp.uint32(
            i * (r * LANES)
        )
    else:
        work_d[pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.int32)
        work_d[pl.ds(SKEW, r)] = d_blk
        run_butterfly(works, work_d, wrows)

    # merge the shared partial row from the VMEM carry (v1 used a per-block
    # HBM read-modify-write here — a DMA round-trip per block; the carry
    # scratch holds the same row for free since the grid is sequential),
    # then refresh the carry with this block's trailing partial row
    lane1 = _lane_iota((1, LANES))
    for w, c in zip(works, carries):
        w[pl.ds(0, 1)] = jnp.where(lane1 < phase, c[...], w[pl.ds(0, 1)])
        c[...] = w[pl.ds(jax.lax.div(phase + cnt, LANES), 1)]

    # append only the rows holding data — ceil((phase+cnt)/128), written in
    # QUARTER-buffer chunks with all starts issued before any wait: writing
    # the whole working buffer cost a full extra HBM pass at 25%
    # selectivity, and fine 32-row chunks with serialized start/wait paid
    # 17 DMA round-trips (measured slower than the full write; the output
    # tail past the global count is garbage by contract anyway)
    nrows_w = jax.lax.div(phase + cnt + (LANES - 1), LANES)
    ch = wrows // 4  # wrows = r + SKEW with SKEW=32: divisible for r>=32
    started = []
    for j in range(4):
        @pl.when(j * ch < nrows_w)
        def _(j=j):
            for w, o in zip(works, outs):
                wr = pltpu.make_async_copy(
                    w.at[pl.ds(j * ch, ch)],
                    o.at[pl.ds(row0 + j * ch, ch)],
                    sem,
                )
                wr.start()
    for j in range(4):
        @pl.when(j * ch < nrows_w)
        def _(j=j):
            for w, o in zip(works, outs):
                wr = pltpu.make_async_copy(
                    w.at[pl.ds(j * ch, ch)],
                    o.at[pl.ds(row0 + j * ch, ch)],
                    sem,
                )
                wr.wait()

    off_ref[0] = offset + cnt

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        count_ref[0] = offset + cnt


@functools.partial(
    jax.jit, static_argnames=("threshold", "block_rows", "interpret", "trace")
)
def filter_compact_pallas(
    values: jnp.ndarray,
    threshold=None,
    block_rows: int = DEF_R,
    interpret: bool = False,
    trace: bool = False,
):
    """Stable compaction of values < threshold; returns (padded, count).

    padded[:count] = passing values in order; padded[count:] is garbage (use
    ops.filter.filter_compact semantics via mask_tail for a clean tail).
    """
    from .filter import FILTER_THRESHOLD

    if threshold is None:
        threshold = FILTER_THRESHOLD
    n = values.shape[0]
    r = block_rows
    # shorter inputs run at the largest block that divides them (the padded
    # wrapper rounds arbitrary lengths up to ONE block first)
    while r > 8 and n % (r * LANES):
        r //= 2
    assert n % (r * LANES) == 0, f"n={n} must be a multiple of {r * LANES}"
    nrows = n // LANES
    nblocks = nrows // r
    x = values.reshape(nrows, LANES)

    out, count = pl.pallas_call(
        functools.partial(_filter_kernel, int(threshold), False, trace),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nrows + r + SKEW, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((r + SKEW, LANES), jnp.uint32),  # packet values
            pltpu.VMEM((r + SKEW, LANES), jnp.int32),  # distances (0 = hole/placed)
            pltpu.VMEM((1, LANES), jnp.uint32),  # cross-block partial-row carry
            pltpu.SMEM((1,), jnp.int32),  # running global offset
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((LANES, LANES), jnp.bfloat16),  # hoisted U
            pltpu.VMEM((r, r), jnp.bfloat16),  # hoisted Lstrict
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: offset carry + RMW
        ),
        interpret=interpret,
    )(x)
    return out[:nrows].reshape(n), count[0].astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("threshold", "block_rows", "interpret", "trace")
)
def filter_with_indices_pallas(
    values: jnp.ndarray,
    threshold=None,
    block_rows: int = DEF_R,
    interpret: bool = False,
    trace: bool = False,
):
    """Selection-vector variant: compacts values AND their original row
    indices in the same pass (the indices ride the butterfly as a second
    routed plane). Returns (padded_values, padded_indices, count); tails are
    garbage — callers slice by count."""
    from .filter import FILTER_THRESHOLD

    if threshold is None:
        threshold = FILTER_THRESHOLD
    n = values.shape[0]
    # packed-plane routing (sel rides the distance word's low 15 bits)
    # needs (r + SKEW) * 128 < 2^16 -> r <= 256
    r = min(block_rows, 256)
    while r > 8 and n % (r * LANES):
        r //= 2
    assert n % (r * LANES) == 0, f"n={n} must be a multiple of {r * LANES}"
    nrows = n // LANES
    nblocks = nrows // r
    x = values.reshape(nrows, LANES)

    out, sel, count = pl.pallas_call(
        functools.partial(_filter_kernel, int(threshold), True, trace),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nrows + r + SKEW, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nrows + r + SKEW, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((r + SKEW, LANES), jnp.uint32),  # values plane
            pltpu.VMEM((r + SKEW, LANES), jnp.uint32),  # index plane
            pltpu.VMEM((r + SKEW, LANES), jnp.int32),  # distances (0 = hole/placed)
            pltpu.VMEM((1, LANES), jnp.uint32),  # partial-row carry (values)
            pltpu.VMEM((1, LANES), jnp.uint32),  # partial-row carry (indices)
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((LANES, LANES), jnp.bfloat16),  # hoisted U
            pltpu.VMEM((r, r), jnp.bfloat16),  # hoisted Lstrict
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x)
    return (
        out[:nrows].reshape(n),
        sel[:nrows].reshape(n),
        count[0].astype(jnp.uint32),
    )


def filter_compact_pallas_clean(values, threshold=None, interpret: bool = False):
    """filter_compact_pallas + poisoned tail (exact filter_compact contract)."""
    out, count = filter_compact_pallas(values, threshold, interpret=interpret)
    lane = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 0)
    return jnp.where(lane < count, out, 0), count


@functools.partial(jax.jit, static_argnames=("fill", "interpret", "trace"))
def filter_pallas_padded(values, fill: int = 0, interpret: bool = False,
                         trace: bool = False):
    """Arbitrary-length wrapper with the ops.filter.filter_compact contract:
    pads to the kernel's block multiple with all-fail sentinels (0xFFFFFFFF
    fails v < 2^30), compacts, slices back, poisons the tail to ``fill``."""
    n = values.shape[0]
    blk = DEF_R * LANES
    pad = (-n) % blk
    x = values
    if pad:
        x = jnp.concatenate([values, jnp.full((pad,), 0xFFFFFFFF, values.dtype)])
    out, count = filter_compact_pallas(x, interpret=interpret, trace=trace)
    out = out[:n]
    lane = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 0)
    return jnp.where(lane < count, out, values.dtype.type(fill)), count
