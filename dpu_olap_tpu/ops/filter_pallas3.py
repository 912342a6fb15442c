"""Pallas TPU kernel: stable filter compaction, v3 (two-stage split network).

The round-4 DESIGN.md stage attribution costed a restructure of the v1
flattened butterfly (ops/filter_pallas.py) into pure-lane within-row levels
plus one per-row rotation gather plus row-aligned levels; this kernel is
that restructure (round-5 verdict item 3). The v1 network routes packets
through log2((R+SKEW)*128) ~ 16 levels over the FLATTENED row-major space,
where every sub-128 shift costs two rolls + a lane-boundary select per
plane. v3 splits the permutation into three cheaper pieces:

  stage A  within-row front-compaction: 7 lane-roll-only levels move each
           row's kept elements to lanes 0..k_i-1 (distances d = lane - rank
           < 128 never leave the row, so the cross-row carry select of the
           flattened form disappears — one roll + select per plane/level).
  stage B  per-row rotation to the global lane phase: ONE
           take_along_axis(axis=1) gather per plane (Mosaic lowers an
           arbitrary per-row 128-lane permutation in a single VPU pass,
           MEASURE_FILTER.json ops.lane_gather) rotates row i right by
           phi_i = (phase + K_i) mod 128, putting every element in its
           final LANE.
  stage C  row-aligned distribution: each element now needs only whole-row
           movement (its destination row is a_i or a_i + 1), so the
           remaining ~9 levels are pure row rolls — the cheapest vector op
           measured in-kernel (5.5us vs 9.3 per (256,128) pass).

A fused alternative — folding the stage-B rotation INTO stage A as cyclic
destinations (phi_i + rank) mod 128 — was checked exhaustively and is NOT
conflict-free (302,340 routing conflicts at L=16 over all masks x phases,
measurements/cyclic_check round 5); the rotation must stay a separate
(conflict-free by construction) gather pass.

Conflict-freedom of the two butterflies: stage A routes monotone
non-decreasing in-row destinations (the classic concentrator property v1's
test suite pins); stage C routes, per lane column, strictly increasing
destination rows (global destinations at a fixed lane are distinct flat
positions congruent mod 128, hence increasing with source row). Both use
v1's 0-encodes-holes self-masking wrap trick (run_butterfly docstring).

Cross-block state matches v1 exactly: SMEM running offset, VMEM
partial-row carry (the shared boundary row), data-proportional chunked DMA
appends. Same contract: (padded_out[, padded_sel], count), garbage tails.

Reference analog: dpu/shared/kernels/filter.c:28-55,100-131 (tasklet
handshake chain + aligned-write fix-ups) — as in v1, the SMEM offset carry
is the handshake running count and the carry row is the odd-element fix-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filter_pallas import SKEW, WCHUNK, _scan_hoisted, _scan_init

LANES = 128
DEF_R = 256  # block rows; with_indices packs flat-in-block into 15 bits


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _stage_a(v, w, r):
    """Within-row front-compaction. w = (d << 7) | cargo packed words (cargo
    = source lane, 7 bits; holes/in-place = whole word semantics of v1's
    packed plane: a kept lane-0 element with d == 0 packs to word 0 == hole,
    which is correct — both mean 'do not move' and its cargo reads back as
    lane 0). Returns (v, w) routed."""
    s = 1
    while s < LANES:
        se = s << 7
        cw = pltpu.roll(w, LANES - s, 1)
        take = (cw & se) != 0
        v = jnp.where(take, pltpu.roll(v, LANES - s, 1), v)
        w = jnp.where(take, cw - se, jnp.where((w & se) == 0, w, 0))
        s *= 2
    return v, w


def _filter3_kernel(threshold, with_indices, x_ref, *refs):
    n_out = 2 if with_indices else 1
    outs = list(refs[:n_out])
    count_ref = refs[n_out]
    sc = list(refs[n_out + 1 :])
    works = sc[:n_out]  # (W,128) value plane [+ sel plane]
    work_d = sc[n_out]  # (W,128) stage-C distance/packed plane
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

    blk = x_ref[:]
    mask = (blk < jnp.uint32(threshold)).astype(jnp.int32)

    # MXU prefix (hoisted triangular operands, filter_pallas._scan_hoisted):
    # in-row inclusive ranks + row-exclusive block offsets + total
    prefix = _scan_hoisted(mask, u_ref, lt_ref)  # (R,128) inclusive flat
    cnt = prefix[r - 1, LANES - 1]
    lane = _lane_iota((r, LANES))
    row = _row_iota((r, LANES))
    # K_i = kept elements before row i in the block = the flattened
    # exclusive prefix at the row's lane 0, broadcast across the row; the
    # per-row inclusive rank is then the flattened prefix minus K_i
    k_row = jnp.broadcast_to((prefix - mask)[:, 0:1], (r, LANES))
    inrow_incl = prefix - k_row  # per-row inclusive rank, 1-based
    j = inrow_incl - 1  # 0-based within-row rank of kept lanes

    # ---- stage A: front-compact each row (7 lane levels, packed cargo) ----
    d_a = jnp.where(mask == 1, lane - j, 0)
    w_a = (d_a << 7) | lane
    v_a, w_a = _stage_a(blk, w_a, r)
    cargo = (w_a & (LANES - 1)).astype(jnp.int32)  # original source lane

    # ---- stage B: rotate row i right by phi_i (one gather per plane) ----
    g = phase + k_row  # (R,LANES) global start of each row's run
    phi = g & (LANES - 1)
    a_row = g >> 7  # destination row of the unwrapped part
    ridx = (lane - phi + LANES) & (LANES - 1)
    v_b = jnp.take_along_axis(v_a, ridx, axis=1)
    if with_indices:
        cargo_b = jnp.take_along_axis(cargo, ridx, axis=1)

    # ---- stage C setup: whole-row distances ----
    j_of = ridx  # rank of the element now sitting at lane t
    k_i = jnp.broadcast_to(inrow_incl[:, LANES - 1 :], (r, LANES))
    real = j_of < k_i
    dstrow = a_row + jnp.where(lane < phi, 1, 0)
    d_c = jnp.where(real, row + SKEW - dstrow, 0)
    if with_indices:
        flat = row * LANES + cargo_b  # < r*128 <= 2^15 (r <= 256)
        w_c = jnp.where(real, (d_c << 15) | flat, 0)
    else:
        w_c = d_c

    works[0][pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.uint32)
    works[0][pl.ds(SKEW, r)] = v_b
    work_d[pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.int32)
    work_d[pl.ds(SKEW, r)] = w_c

    # ---- stage C: row-aligned butterfly (pure row rolls) ----
    dshift = 15 if with_indices else 0
    s = 1
    while s < wrows:
        se = s << dshift
        d = work_d[:]
        cd = pltpu.roll(d, wrows - s, 0)
        take = (cd & se) != 0
        v = works[0][:]
        works[0][:] = jnp.where(take, pltpu.roll(v, wrows - s, 0), v)
        work_d[:] = jnp.where(take, cd - se, jnp.where((d & se) == 0, d, 0))
        s *= 2
    if with_indices:
        works[1][...] = (work_d[...] & 0x7FFF).astype(jnp.uint32) + jnp.uint32(
            i * (r * LANES)
        )

    # merge the shared partial row from the VMEM carry, refresh the carry
    lane1 = _lane_iota((1, LANES))
    for w, c in zip(works, carries):
        w[pl.ds(0, 1)] = jnp.where(lane1 < phase, c[...], w[pl.ds(0, 1)])
        c[...] = w[pl.ds(jax.lax.div(phase + cnt, LANES), 1)]

    # data-proportional chunked DMA append (v1's quarter-buffer scheme)
    nrows_w = jax.lax.div(phase + cnt + (LANES - 1), LANES)
    ch = wrows // 4
    for j4 in range(4):
        @pl.when(j4 * ch < nrows_w)
        def _(j4=j4):
            for w, o in zip(works, outs):
                pltpu.make_async_copy(
                    w.at[pl.ds(j4 * ch, ch)],
                    o.at[pl.ds(row0 + j4 * ch, ch)],
                    sem,
                ).start()
    for j4 in range(4):
        @pl.when(j4 * ch < nrows_w)
        def _(j4=j4):
            for w, o in zip(works, outs):
                pltpu.make_async_copy(
                    w.at[pl.ds(j4 * ch, ch)],
                    o.at[pl.ds(row0 + j4 * ch, ch)],
                    sem,
                ).wait()

    off_ref[0] = offset + cnt

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        count_ref[0] = offset + cnt


def _call(values, threshold, with_indices, block_rows, interpret):
    n = values.shape[0]
    # stage-C packed cargo (flat-in-block, 15 bits) bounds with_indices
    # blocks at 256 rows; the compact plane has no cargo but D < 2^16 and
    # the stage-A cargo is always 7 bits, so 512-row compact blocks are fine
    r = min(block_rows, 256) if with_indices else block_rows
    while r > 8 and n % (r * LANES):
        r //= 2
    assert n % (r * LANES) == 0, f"n={n} must be a multiple of {r * LANES}"
    nrows = n // LANES
    nblocks = nrows // r
    x = values.reshape(nrows, LANES)

    n_out = 2 if with_indices else 1
    out_shapes = tuple(
        jax.ShapeDtypeStruct((nrows + r + SKEW, LANES), jnp.uint32)
        for _ in range(n_out)
    ) + (jax.ShapeDtypeStruct((1,), jnp.int32),)
    out_specs = tuple(
        pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)
    ) + (pl.BlockSpec(memory_space=pltpu.SMEM),)
    scratch = (
        [pltpu.VMEM((r + SKEW, LANES), jnp.uint32) for _ in range(n_out)]
        + [pltpu.VMEM((r + SKEW, LANES), jnp.int32)]  # stage-C distances
        + [pltpu.VMEM((1, LANES), jnp.uint32) for _ in range(n_out)]  # carry
        + [
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((LANES, LANES), jnp.bfloat16),  # hoisted U
            pltpu.VMEM((r, r), jnp.bfloat16),  # hoisted Lstrict
        ]
    )
    res = pl.pallas_call(
        functools.partial(_filter3_kernel, int(threshold), with_indices),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: offset carry
        ),
        interpret=interpret,
    )(x)
    outs = [res[k][:nrows].reshape(n) for k in range(n_out)]
    count = res[n_out][0].astype(jnp.uint32)
    return (*outs, count)


@functools.partial(
    jax.jit, static_argnames=("threshold", "block_rows", "interpret")
)
def filter_compact_pallas3(
    values, threshold=None, block_rows: int = DEF_R, interpret: bool = False
):
    """Stable compaction of values < threshold; returns (padded, count).
    padded[:count] = passing values in order; padded[count:] is garbage."""
    from .filter import FILTER_THRESHOLD

    if threshold is None:
        threshold = FILTER_THRESHOLD
    return _call(values, threshold, False, block_rows, interpret)


@functools.partial(jax.jit, static_argnames=("fill", "interpret"))
def filter_pallas3_padded(values, fill: int = 0, interpret: bool = False):
    """Arbitrary-length wrapper with the ops.filter.filter_compact contract
    (mirrors filter_pallas.filter_pallas_padded): pads with all-fail
    sentinels, compacts with the v3 kernel, poisons the tail to ``fill``.

    v3 was briefly the compact-path default (single-process "+10% over v1"
    capture); the round-5 6-sample interleaved A/B retracted that — v1 r512
    leads by median at both scales (MEASURE_FILTER.json defaultab), so v3
    is now a tested alternate. The with-indices variant stays on v1 (v3's
    two rotation gathers lose there, 0.62 vs 0.52 ms)."""
    n = values.shape[0]
    blk = DEF_R * LANES
    pad = (-n) % blk
    x = values
    if pad:
        x = jnp.concatenate(
            [values, jnp.full((pad,), 0xFFFFFFFF, values.dtype)]
        )
    out, count = filter_compact_pallas3(x, interpret=interpret)
    out = out[:n]
    lane = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 0)
    return jnp.where(lane < count, out, values.dtype.type(fill)), count


@functools.partial(
    jax.jit, static_argnames=("threshold", "block_rows", "interpret")
)
def filter_with_indices_pallas3(
    values, threshold=None, block_rows: int = DEF_R, interpret: bool = False
):
    """Selection-vector variant: compacts values AND their original flat
    indices. Returns (padded_values, padded_indices, count)."""
    from .filter import FILTER_THRESHOLD

    if threshold is None:
        threshold = FILTER_THRESHOLD
    return _call(values, threshold, True, block_rows, interpret)
