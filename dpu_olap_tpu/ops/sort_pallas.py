"""Pallas TPU bitonic machinery: cross-block stage kernel + merge-tree sort.

Motivation (MEASURE_MERGE.json, v5e, 2Mi uint32 + 1 payload plane):
  - flat XLA 2-op sort            3.22 ms   (the co-sort join's probe sort)
  - batched XLA sort (256, 8Ki)   0.94 ms   (rows sort in VMEM — 3.4x cheaper)
  - XLA cross-block merge stages  1.00 ms   (6 slice/concat passes, each a
                                             full HBM materialization)
  - Pallas in-block cascade       0.18 ms   (16 stages fused in one pass)

So both the bitonic merge and a full sort are cross-block-stage-bound, and
those stages pair WHOLE 64Ki blocks elementwise — no intra-block data
movement at all. The kernel here loads the paired blocks' column chunks into
VMEM once and runs every cross-block stage in one HBM pass (bitonic_xblock).
On top of it, sort_bitonic builds the classic bitonic sorter as a merge
tree: XLA batched row sorts make alternating asc/desc leaves (direction via
the key-complement trick, so the sorts fuse), then each round runs
cross-block stages (one xblock pass) + the in-block cascade (one pass).

Direction handling: a bitonic sorter needs segment s of round L ascending
iff s is even. Kernels flip the comparator per segment by XOR-ing the key
plane with per-segment 0/~0 before and after the compare-exchange cascade
(x <= y on complemented keys == y <= x on true keys, bit-exactly).

Reference analog: none — the reference has no device sort; this serves the
co-sort join (SURVEY.md §2.5 JoinDpu) whose cost ceiling is the sort
(DESIGN.md "Known gaps").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# rows per cascade block -> 128Ki elements; v5e sweep 512/1024/2048 ->
# 2.27/2.18/VMEM-OOM ms on the 2Mi 2-plane sort (2048 needs 16.4MB > 16MB)
BLOCK_ROWS = 1024
LEAF = 4096  # leaf run length for sort_bitonic's batched XLA sort
# (v5e sweep, 2Mi + 1 payload: leaf 1024/2048/4096/8192/16384 ->
#  2.45/2.15/1.65/2.10/2.57 ms vs flat XLA 2-op sort 3.38 ms)


def _signed(k):
    # Mosaic has no unsigned min/max; ^0x80000000 maps uint32 order onto
    # int32 order bit-exactly (same-width astype is a bitcast).
    return (k ^ jnp.uint32(0x80000000)).astype(jnp.int32)


def _unsigned(k):
    return k.astype(jnp.uint32) ^ jnp.uint32(0x80000000)


def _xblock_kernel(n_pay, m, alternating, dir_stride, *refs):
    """Cross-block compare-exchange: dim0 of each (M, W, 128) ref indexes the
    M cascade blocks of ONE segment; stages pair dim0 indices at distances
    M/2 .. 1. All slices are static 2-D (W, 128) arrays — no dynamic
    addressing, no rolls. dir_stride: consecutive grid segments belonging to
    the same PARENT bitonic segment (= 1 unless the caller split oversized
    segments, see bitonic_xblock) share a sort direction."""
    ins = refs[: 1 + n_pay]
    outs = refs[1 + n_pay :]
    s = pl.program_id(0)

    if alternating:
        flip = jnp.where(
            ((s // dir_stride) % 2) == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
        )
    else:
        flip = jnp.uint32(0)

    ks = [_signed(ins[0][i] ^ flip) for i in range(m)]
    pays = [[p[i] for i in range(m)] for p in ins[1:]]

    d = m // 2
    while d >= 1:
        for g in range(0, m, 2 * d):
            for i in range(g, g + d):
                j = i + d
                a, b = ks[i], ks[j]
                t = a <= b  # lo keeps its element on ties
                ks[i] = jnp.minimum(a, b)
                ks[j] = jnp.maximum(a, b)
                for pp in pays:
                    pa, pb = pp[i], pp[j]
                    pp[i] = jnp.where(t, pa, pb)
                    pp[j] = jnp.where(t, pb, pa)
        d //= 2

    for i in range(m):
        outs[0][i] = _unsigned(ks[i]) ^ flip
        for o, pp in zip(outs[1:], pays):
            o[i] = pp[i]


@functools.partial(
    jax.jit,
    static_argnames=("seg_len", "low_d", "alternating", "interpret"),
)
def bitonic_xblock(
    planes: tuple,
    seg_len: int,
    low_d: int = BLOCK_ROWS * LANES,
    alternating: bool = False,
    interpret: bool = False,
):
    """Run the cross-block bitonic stages d = seg_len/2 .. low_d on every
    seg_len segment of the planes (planes[0] = uint32 key; each segment must
    be bitonic). low_d is the handoff distance: stages below it belong to the
    in-block cascade (bitonic_cascade_blocks with block = low_d). Segment s
    sorts ascending, or descending for odd s when alternating=True."""
    n = planes[0].shape[0]
    assert n % seg_len == 0 and seg_len % low_d == 0
    m = seg_len // low_d  # cascade blocks per segment
    if m == 1:
        return tuple(planes)
    n_pay = len(planes) - 1

    # VMEM cap: the kernel holds m blocks' chunks x (1+n_pay) planes, in and
    # out. Beyond M_MAX blocks the largest stages run as XLA whole-plane
    # select passes (one HBM pass each; only log2(m/M_MAX) of them), after
    # which the remaining network splits into independent aligned groups of
    # M_MAX blocks that the fused kernel handles — each group inherits its
    # PARENT segment's sort direction (dir_stride).
    M_MAX = 64
    eff_seg = seg_len
    if m > M_MAX:
        planes = list(planes)
        d = (m // 2) * low_d  # element distance of the current stage
        while d >= M_MAX * low_d:
            groups = n // (2 * d)
            shaped = [p.reshape(groups, 2 * d) for p in planes]
            if alternating:
                gi = jax.lax.broadcasted_iota(jnp.uint32, (groups, 1), 0)
                desc = ((gi * (2 * d)) // seg_len) % 2 == 1
            else:
                desc = jnp.zeros((groups, 1), jnp.bool_)
            lo_k, hi_k = shaped[0][:, :d], shaped[0][:, d:]
            take_lo = (lo_k <= hi_k) ^ desc
            out = []
            for p in shaped:
                lo, hi = p[:, :d], p[:, d:]
                nlo = jnp.where(take_lo, lo, hi)
                nhi = jnp.where(take_lo, hi, lo)
                out.append(jnp.concatenate([nlo, nhi], axis=1).reshape(n))
            planes = out
            d //= 2
        eff_seg = M_MAX * low_d
        m = M_MAX
        planes = tuple(planes)

    segs = n // eff_seg
    dir_stride = seg_len // eff_seg
    vrows = low_d // LANES  # rows per cascade block
    # chunk width: cap VMEM at ~4MB of in-blocks per plane set
    w = max(8, min(vrows, (1 << 20) // (m * LANES * 4 * (1 + n_pay))))
    while vrows % w:
        w //= 2
    v3 = [p.reshape(n // (vrows * LANES), vrows, LANES) for p in planes]

    spec = lambda: pl.BlockSpec(
        (m, w, LANES), lambda s_, c: (s_, c, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_xblock_kernel, n_pay, m, alternating, dir_stride),
        grid=(segs, vrows // w),
        in_specs=[spec() for _ in v3],
        out_shape=tuple(
            jax.ShapeDtypeStruct(v.shape, v.dtype) for v in v3
        ),
        out_specs=tuple(spec() for _ in v3),
        interpret=interpret,
    )(*v3)
    return tuple(o.reshape(n) for o in out)


def _cascade_kernel(n_pay, start_d, seg_rows, alternating, *refs):
    """In-block bitonic cascade d = start_d .. 1 with per-segment direction:
    rows r with (global_row // seg_rows) odd run a descending comparator
    (key-complement trick). seg_rows >= block rows means direction is
    uniform per block; smaller segments alternate within the block."""
    ins = refs[: 1 + n_pay]
    outs = refs[1 + n_pay :]
    r = ins[0].shape[0]
    i = pl.program_id(0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    if alternating:
        grow = row + i * r
        flip = jnp.where(
            ((grow // seg_rows) % 2) == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
        )
    else:
        flip = jnp.uint32(0)

    k = _signed(ins[0][:] ^ flip)
    ps = [p[:] for p in ins[1:]]
    k, ps = _cascade_stages(k, ps, start_d, r, lane, row)
    outs[0][:] = _unsigned(k) ^ flip
    for o, p in zip(outs[1:], ps):
        o[:] = p


def _cascade_stages(k, ps, start_d, r, lane, row):
    """The shared compare-exchange stage loop d = start_d .. 1 on signed keys
    k with payload planes ps, all (r, 128) VMEM values."""
    d = start_d
    while d >= 1:
        if d >= LANES:
            rr = d // LANES
            a_k = pltpu.roll(k, r - rr, 0)  # k[row + rr]
            sel_lo = (row & rr) == 0
        else:
            a_k = pltpu.roll(k, LANES - d, 1)  # k[lane + d] (within row)
            sel_lo = (lane & d) == 0
        t = k <= a_k
        mn = jnp.minimum(k, a_k)
        mx = jnp.maximum(k, a_k)
        if d >= LANES:
            k = jnp.where(sel_lo, mn, pltpu.roll(mx, d // LANES, 0))
        else:
            k = jnp.where(sel_lo, mn, pltpu.roll(mx, d, 1))
        new_ps = []
        for p in ps:
            if d >= LANES:
                a_p = pltpu.roll(p, r - d // LANES, 0)
            else:
                a_p = pltpu.roll(p, LANES - d, 1)
            lo_res = jnp.where(t, p, a_p)  # payload of min (tie: own)
            hi_res = jnp.where(t, a_p, p)  # payload of max (tie: partner's)
            if d >= LANES:
                new_ps.append(
                    jnp.where(sel_lo, lo_res, pltpu.roll(hi_res, d // LANES, 0))
                )
            else:
                new_ps.append(
                    jnp.where(sel_lo, lo_res, pltpu.roll(hi_res, d, 1))
                )
        ps = new_ps
        d //= 2
    return k, ps


def _cascade_rounds_kernel(n_pay, seg_from, seg_to, *refs):
    """Multiple full merge rounds fused in VMEM: for seg = seg_from,
    2*seg_from, .., seg_to run the whole cascade d = seg/2 .. 1 with
    per-segment alternating directions. Each block must be seg_to-aligned
    (seg_to <= block elements). The final global round needs no special
    ascending-override: when seg equals the whole array, every row's
    (grow // seg_rows) is 0 => no flip."""
    ins = refs[: 1 + n_pay]
    outs = refs[1 + n_pay :]
    r = ins[0].shape[0]
    i = pl.program_id(0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    grow = row + i * r

    k_raw = ins[0][:]
    ps = [p[:] for p in ins[1:]]
    seg = seg_from
    while seg <= seg_to:
        seg_rows = seg // LANES
        flip = jnp.where(
            ((grow // seg_rows) % 2) == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
        )
        k = _signed(k_raw ^ flip)
        k, ps = _cascade_stages(k, ps, seg // 2, r, lane, row)
        k_raw = _unsigned(k) ^ flip
        seg *= 2

    outs[0][:] = k_raw
    for o, p in zip(outs[1:], ps):
        o[:] = p


@functools.partial(
    jax.jit,
    static_argnames=("seg_from", "seg_to", "block_rows", "interpret"),
)
def bitonic_cascade_rounds(
    planes: tuple,
    seg_from: int,
    seg_to: int,
    block_rows: int = BLOCK_ROWS,
    interpret: bool = False,
):
    """Fused multi-round merge: input whose seg_from/2-length runs are
    sorted in alternating directions comes out with seg_to-length runs
    sorted in alternating directions (ascending if seg_to == n), in ONE
    HBM pass instead of one per round. Requires LANES <= seg_from and
    seg_to <= block_rows*128 and seg_to | n."""
    n = planes[0].shape[0]
    r = block_rows
    while n % (r * LANES):
        r //= 2
    if seg_to > r * LANES:
        raise ValueError(f"seg_to={seg_to} exceeds block {r * LANES}")
    assert seg_from >= LANES and seg_to % seg_from == 0
    nrows = n // LANES
    n_pay = len(planes) - 1
    v2 = [p.reshape(nrows, LANES) for p in planes]

    spec = lambda: pl.BlockSpec(
        (r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_cascade_rounds_kernel, n_pay, seg_from, seg_to),
        grid=(nrows // r,),
        in_specs=[spec() for _ in v2],
        out_shape=tuple(jax.ShapeDtypeStruct(v.shape, v.dtype) for v in v2),
        out_specs=tuple(spec() for _ in v2),
        interpret=interpret,
    )(*v2)
    return tuple(o.reshape(n) for o in out)


@functools.partial(
    jax.jit,
    static_argnames=("start_d", "seg_len", "alternating", "block_rows", "interpret"),
)
def bitonic_cascade_blocks(
    planes: tuple,
    start_d: int,
    seg_len: int,
    alternating: bool = False,
    block_rows: int = BLOCK_ROWS,
    interpret: bool = False,
):
    """Fused in-block bitonic stages d = start_d .. 1. Correct iff the
    cross-block stages (d > start_d within each seg_len segment) already ran
    and 2*start_d <= block_rows*128. Direction alternates per segment when
    alternating=True (odd segments descending)."""
    n = planes[0].shape[0]
    r = block_rows
    while n % (r * LANES):
        r //= 2
    assert 2 * start_d <= r * LANES and seg_len % LANES == 0
    nrows = n // LANES
    n_pay = len(planes) - 1
    v2 = [p.reshape(nrows, LANES) for p in planes]

    spec = lambda: pl.BlockSpec(
        (r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _cascade_kernel, n_pay, start_d, seg_len // LANES, alternating
        ),
        grid=(nrows // r,),
        in_specs=[spec() for _ in v2],
        out_shape=tuple(jax.ShapeDtypeStruct(v.shape, v.dtype) for v in v2),
        out_specs=tuple(spec() for _ in v2),
        interpret=interpret,
    )(*v2)
    return tuple(o.reshape(n) for o in out)


def sortable_bitonic(n: int, leaf: int = LEAF) -> bool:
    """sort_bitonic handles any length >= 2 leaf rows: non-power-of-two
    inputs are max-key padded to the next power of two and sliced back
    (see sort_bitonic docstring for the 0xFFFFFFFF-key caveat)."""
    return n >= 2 * leaf


def _default_geometry(n: int) -> tuple:
    """Shape-aware (leaf, block_rows): at >= 2Mi the XLA batched leaf sort
    runs 1.9x faster at 2048 columns than 4096 and block 512 wins the
    cascade (round-4 sweep, MEASURE_FILTER.json sort/sort2: full 2Mi 2-op
    2.08ms at leaf2048/br512 vs 2.21 at leaf4096/br1024); at 512Ki the
    leaf-4096 tree is measured faster (MEASURE_R3 take2 sort table)."""
    if n >= (2 << 20):
        return 2048, 512
    return LEAF, BLOCK_ROWS


@functools.partial(
    jax.jit, static_argnames=("leaf", "block_rows", "interpret")
)
def sort_bitonic(
    planes: tuple,
    leaf: int | None = None,
    block_rows: int | None = None,
    interpret: bool = False,
):
    """Full sort of planes[0] (uint32) with payload planes following, as a
    bitonic merge tree: XLA batched row sorts make alternating asc/desc
    leaves; every merge round with seg <= block fuses into ONE multi-round
    cascade pass (bitonic_cascade_rounds — saves an HBM pass per round);
    each larger round runs its cross-block stages in one fused pass
    (bitonic_xblock) and its in-block stages in another
    (bitonic_cascade_blocks). ~1.6x the flat XLA 2-operand sort at 2Mi
    (see module docstring).

    Non-power-of-two lengths are padded to the next power of two with
    0xFFFFFFFF keys (payloads 0xFFFFFFFF) and the outputs sliced back to n. The
    bitonic network is unstable, so when REAL keys equal 0xFFFFFFFF their
    payloads may interleave with the padding's zeros in the slice — callers
    must either keep keys < 0xFFFFFFFF or not depend on max-key payloads
    (join_shard_fused qualifies: lanes whose packed key reaches 0xFFFFFFFE
    decode to EMPTY and are masked out of ``matched``). Worst-case padding
    doubles the work, still at or under the flat XLA sort it replaces."""
    n_out = planes[0].shape[0]
    dleaf, dbr = _default_geometry(n_out)
    if leaf is None:
        leaf = dleaf
    if block_rows is None:
        block_rows = dbr
    assert sortable_bitonic(n_out, leaf), f"n={n_out} too short, < {2 * leaf}"
    assert 2 * leaf >= LANES, f"leaf={leaf} too small (cascade needs >= 64)"
    n = 1 << (n_out - 1).bit_length()
    if n != n_out:
        # pad payloads with the MAX value, not 0: callers whose real keys
        # stay < 0xFFFFFFFF are unaffected (pads sort strictly last), and
        # callers with sentinel max keys (take_sorted, ht_probe_sorted) can
        # then distinguish leaked pad payloads from real ones — a pad
        # payload of 0 once displaced a real pos-0 entry through the
        # restore sort (round-3 review finding, tests pin it now)
        planes = tuple(
            jnp.concatenate([p, jnp.full((n - n_out,), 0xFFFFFFFF, p.dtype)])
            for p in planes
        )
    rows = n // leaf
    block = block_rows * LANES

    # leaves: odd rows sort descending via key complement (fuses into sort)
    rflip = (
        jax.lax.broadcasted_iota(jnp.uint32, (rows, leaf), 0) % jnp.uint32(2)
    ) * jnp.uint32(0xFFFFFFFF)
    k2 = planes[0].reshape(rows, leaf) ^ rflip
    sorted_leaves = jax.lax.sort(
        [k2] + [p.reshape(rows, leaf) for p in planes[1:]],
        dimension=1,
        num_keys=1,
    )
    cur = tuple(
        [(sorted_leaves[0] ^ rflip).reshape(n)]
        + [p.reshape(n) for p in sorted_leaves[1:]]
    )

    seg = 2 * leaf
    in_block_to = min(n, block)
    if seg <= in_block_to and seg >= LANES:
        cur = bitonic_cascade_rounds(
            cur, seg_from=seg, seg_to=in_block_to,
            block_rows=block_rows, interpret=interpret,
        )
        seg = 2 * in_block_to
    while seg <= n:
        alt = seg < n  # the final round's single segment sorts ascending
        cur = bitonic_xblock(
            cur, seg_len=seg, low_d=block, alternating=alt,
            interpret=interpret,
        )
        cur = bitonic_cascade_blocks(
            cur,
            start_d=block // 2,
            seg_len=seg,
            alternating=alt,
            block_rows=block_rows,
            interpret=interpret,
        )
        seg *= 2
    if n != n_out:
        cur = tuple(c[:n_out] for c in cur)
    return cur
