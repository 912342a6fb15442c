"""Pallas TPU kernel: stable filter compaction, v4 (MXU-routed row phase).

v3 (ops/filter_pallas3.py) reduced the v1 flattened butterfly to
  stage A: 7 pure-lane levels (within-row front-compaction)
  stage B: ONE per-row rotation gather to the global lane phase
  stage C: ~8 row-roll levels (whole-row distribution)
and measured stage C at ~0.27 ms/8Mi — the largest single chunk left
(DESIGN.md round-4 stage attribution). v4 keeps A and B and replaces the
stage-C roll network with a closed-form INVERSE map evaluated on the MXU:

After stage B, the element destined for flat output position p sits at
(row sr(p), lane p mod 128), where sr(p) is the source row whose run
[g_i, g_i + cnt_i) contains p (g_i = phase + K_i, the tile-global start
of row i's kept run; runs are contiguous by construction). So the whole
row phase is ONE gather:

    out[o, l] = v_b[sr(o*128 + l), l]

sr is a searchsorted over the 128 non-decreasing g_i — evaluated WITHOUT
any network, as counting matmuls on one-hot bf16 operands (0/1 entries and
counts <= 128 are bf16/f32-exact, the _scan_hoisted trick):

    sr(o,l) = #{i : g_i <= o*128 + l} - 1
            = sum_i [dst0_i < o]  +  sum_i [dst0_i == o][s_i <= l]  - 1
            = S0[o]              +  (LE_S^T @ OH_O)[l, o]           - 1

with dst0_i = g_i >> 7, s_i = g_i & 127: one (128,128)@(128,128) bf16
matmul plus one sublane reduction. The gather runs along lanes, so the
data transposes in, gathers with sr_T (already in (l, o) layout — no index
transpose), and transposes back; Mosaic lowers (128,128) u32 transposes
and the square take_along_axis(axis=1) (pinned in
tests/test_tpu_lowering.py). The one spill row (output row 128, reached
only when phase + cnt > 16384) is provably the tail of the LAST source
row's run (all g_i <= 16383 < 16384, and if row 127 were empty the total
could not pass 16384), so it is a plain copy of v_b row 127 — no second
gather chunk.

The gather bounds a routing TILE at 128 rows, but 128-row GRID blocks pay
~2x fixed cost (the v1 block_rows sweep: 30 vs 45 GB/s at 64Mi for
r128/r512 — input-pipeline DMA granularity + grid overhead). So one grid
block processes ``halves`` 128-row tiles sequentially, carrying (offset,
carry row) between tiles in registers/VMEM and issuing ONE chunked output
DMA — r512-class block amortization with 128-row routing tiles.

The with-indices variant rides the original flat index as a full u32 plane
through the SAME sr_T (one extra transpose+gather+transpose) — no 15-bit
cargo packing, so block size is unbounded.

Cross-block state matches v1/v3: SMEM running offset, VMEM partial-row
carry, data-proportional chunked DMA appends. Same contract:
(padded_out[, padded_sel], count), garbage tails.

Reference analog: dpu/shared/kernels/filter.c:28-55,100-131 (tasklet
handshake chain + aligned-write fix-ups) — the SMEM offset carry is the
handshake running count and the carry row is the odd-element fix-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filter_pallas import WCHUNK, _scan_hoisted, _scan_init
from .filter_pallas3 import _stage_a

LANES = 128
R4 = 128  # tile rows: the stage-C' gather spans exactly one 128-lane vreg
DEF_HALVES = 4  # 128-row tiles per grid block (512-row blocks, v1's best)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _filter4_kernel(threshold, with_indices, halves, x_ref, *refs):
    n_out = 2 if with_indices else 1
    outs = list(refs[:n_out])
    count_ref = refs[n_out]
    sc = list(refs[n_out:])[1:]
    works = sc[:n_out]  # (wrows,128) value plane [+ index plane]
    carries = sc[n_out : 2 * n_out]
    off_ref = sc[2 * n_out]
    sem = sc[2 * n_out + 1]
    u_ref, lt_ref = sc[2 * n_out + 2 : 2 * n_out + 4]

    i = pl.program_id(0)
    r = R4
    wrows = halves * r + WCHUNK

    @pl.when(i == 0)
    def _():
        off_ref[0] = 0
        _scan_init(u_ref, lt_ref)
        for c in carries:
            c[...] = jnp.zeros((1, LANES), jnp.uint32)

    offset0 = off_ref[0]
    row0 = jax.lax.div(offset0, LANES)
    offset = offset0
    lane = _lane_iota((r, LANES))
    lane1 = _lane_iota((1, LANES))

    for h in range(halves):
        phase = jax.lax.rem(offset, LANES)
        base = jax.lax.div(offset, LANES) - row0  # tile's first work row

        blk = x_ref[pl.ds(h * r, r)]
        mask = (blk < jnp.uint32(threshold)).astype(jnp.int32)

        # MXU prefix: in-row inclusive ranks + row-exclusive tile offsets
        prefix = _scan_hoisted(mask, u_ref, lt_ref)  # (128,128) incl. flat
        cnt = prefix[r - 1, LANES - 1]
        k_col = (prefix - mask)[:, 0:1]  # (128,1) kept-before-row-i
        k_row = jnp.broadcast_to(k_col, (r, LANES))
        j = prefix - k_row - 1  # 0-based within-row rank of kept lanes

        # ---- stage A: front-compact each row (7 lane levels) ----
        d_a = jnp.where(mask == 1, lane - j, 0)
        w_a = (d_a << 7) | lane
        v_a, w_a = _stage_a(blk, w_a, r)
        cargo = (w_a & (LANES - 1)).astype(jnp.int32)  # original source lane

        # ---- stage B: rotate row i right by phi_i (one gather/plane) ----
        g_col = phase + k_col  # (128,1) global run starts, <= 16383
        phi = jnp.broadcast_to(g_col & (LANES - 1), (r, LANES))
        ridx = (lane - phi + LANES) & (LANES - 1)
        v_b = jnp.take_along_axis(v_a, ridx, axis=1)
        planes = [v_b]
        if with_indices:
            cargo_b = jnp.take_along_axis(cargo, ridx, axis=1)
            flat = (
                (i * halves + h) * r + _row_iota((r, LANES))
            ) * LANES + cargo_b
            planes.append(flat.astype(jnp.uint32))

        # ---- stage C': closed-form inverse map on the MXU ----
        dst0 = g_col >> 7  # (128,1) in [0,127]
        s = g_col & (LANES - 1)
        le_s = (s <= lane).astype(jnp.bfloat16)  # [i,l]
        oh_o = (dst0 == lane).astype(jnp.bfloat16)  # [i,o]
        # (l,o) counting matmul: starts in output row o at lane <= l
        dg1 = jax.lax.dot_general(
            le_s, oh_o, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s0 = jnp.sum((dst0 < lane).astype(jnp.int32), axis=0, keepdims=True)
        sr_t = dg1.astype(jnp.int32) + s0 - 1  # (l,o)
        sr_t = jnp.clip(sr_t, 0, r - 1)

        for p, w in zip(planes, works):
            out_t = jnp.take_along_axis(jnp.transpose(p), sr_t, axis=1)
            w[pl.ds(base, r)] = jnp.transpose(out_t)
            w[pl.ds(base + r, 1)] = p[r - 1 : r, :]  # spill = last run tail

        # merge the shared partial row from the carry, refresh the carry
        for w, c in zip(works, carries):
            w[pl.ds(base, 1)] = jnp.where(lane1 < phase, c[...],
                                          w[pl.ds(base, 1)])
            c[...] = w[pl.ds(base + jax.lax.div(phase + cnt, LANES), 1)]

        offset = offset + cnt

    # data-proportional chunked DMA append (v1's quarter-buffer scheme)
    nrows_w = jax.lax.div(offset - row0 * LANES + (LANES - 1), LANES)
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

    off_ref[0] = offset

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        count_ref[0] = offset


def _call(values, threshold, with_indices, halves, interpret):
    n = values.shape[0]
    r = R4
    rb = halves * r  # rows per grid block
    assert n % (rb * LANES) == 0, f"n={n} must be a multiple of {rb * LANES}"
    nrows = n // LANES
    nblocks = nrows // rb
    wrows = rb + WCHUNK
    x = values.reshape(nrows, LANES)

    n_out = 2 if with_indices else 1
    out_shapes = tuple(
        jax.ShapeDtypeStruct((nrows + wrows, LANES), jnp.uint32)
        for _ in range(n_out)
    ) + (jax.ShapeDtypeStruct((1,), jnp.int32),)
    out_specs = tuple(
        pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)
    ) + (pl.BlockSpec(memory_space=pltpu.SMEM),)
    scratch = (
        [pltpu.VMEM((wrows, LANES), jnp.uint32) for _ in range(n_out)]
        + [pltpu.VMEM((1, LANES), jnp.uint32) for _ in range(n_out)]  # carry
        + [
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((LANES, LANES), jnp.bfloat16),  # hoisted U
            pltpu.VMEM((r, r), jnp.bfloat16),  # hoisted Lstrict
        ]
    )
    res = pl.pallas_call(
        functools.partial(
            _filter4_kernel, int(threshold), with_indices, halves
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
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
    jax.jit, static_argnames=("threshold", "halves", "interpret")
)
def filter_compact_pallas4(
    values, threshold=None, halves: int = DEF_HALVES, interpret: bool = False
):
    """Stable compaction of values < threshold; returns (padded, count).
    padded[:count] = passing values in order; padded[count:] is garbage."""
    from .filter import FILTER_THRESHOLD

    if threshold is None:
        threshold = FILTER_THRESHOLD
    return _call(values, threshold, False, halves, interpret)


@functools.partial(jax.jit, static_argnames=("fill", "halves", "interpret"))
def filter_pallas4_padded(
    values, fill: int = 0, halves: int = DEF_HALVES, interpret: bool = False
):
    """Arbitrary-length wrapper with the ops.filter.filter_compact contract:
    pads with all-fail sentinels, compacts with the v4 kernel, poisons the
    tail to ``fill``."""
    n = values.shape[0]
    blk = halves * R4 * LANES
    pad = (-n) % blk
    x = values
    if pad:
        x = jnp.concatenate(
            [values, jnp.full((pad,), 0xFFFFFFFF, values.dtype)]
        )
    out, count = filter_compact_pallas4(x, halves=halves, interpret=interpret)
    out = out[:n]
    lane = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 0)
    return jnp.where(lane < count, out, values.dtype.type(fill)), count


@functools.partial(
    jax.jit, static_argnames=("threshold", "halves", "interpret")
)
def filter_with_indices_pallas4(
    values, threshold=None, halves: int = DEF_HALVES, interpret: bool = False
):
    """Selection-vector variant: compacts values AND their original flat
    indices (full u32 plane — no 15-bit cargo packing, unlike v1/v3).
    Returns (padded_values, padded_indices, count)."""
    from .filter import FILTER_THRESHOLD

    if threshold is None:
        threshold = FILTER_THRESHOLD
    return _call(values, threshold, True, halves, interpret)
