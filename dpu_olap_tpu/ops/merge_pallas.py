"""Pallas TPU kernel: streaming merge-probe over two sorted key columns.

For every element x of a SORTED probe column, find the greatest key <= x in a
SORTED (unique-key) build column, plus that key's payloads — the inner loop
of a merge join. Combined with one probe-side sort this replaces the fused
co-sort join's (n_l + n_r)-row sort whenever the build side arrives sorted
(clustered primary keys — detectable in O(n)), cutting the join's dominant
cost roughly in half; with both sides sorted the whole probe is one pass.

Reference analog: the hash-probe kernel's role (hash_probe.c) — here the
"table" is the sorted column itself and the lookup is a merge, which
vectorizes where pointer chasing cannot (DESIGN.md).

Structure: the grid streams probe-side blocks (C elements, sorted). SMEM
carries persist across the sequential grid:
  * build chunks wholly below the current probe block fold into a scalar
    carry (their last element is the running "greatest key so far");
  * straddling chunks are DMA-loaded and joined per-element: bitonic-merge
    the two sorted C-blocks ((key, side) comparator puts build keys before
    equal probe keys), forward-propagate the build entries through the
    merged order, then butterfly-extract the probe elements' results back
    into probe order (probe elements keep relative order, so extraction is
    an order-preserving concentration).
All three in-VMEM networks are log-stage roll cascades (measured ~5us per
stage-plane per 4Mi elements on v5e — DMA and the probe-side sort dominate).
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
    _shift_down,
    run_butterfly,
)
from .scan_pallas import _shift_up

EMPTY = np.uint32(0xFFFFFFFF)
# Probe block rows (C = DEF_R*128 elements per grid step). Tuned on v5e:
# r=16 -> 12.4ms for 2Mi x 2Mi (grid-step overhead dominates), r=64 -> 5.0ms,
# r=128 -> 5.1ms.
DEF_R = 64


# NOTE: Mosaic has no `rev` lowering, so block reversal is done OUTSIDE the
# kernel: the wrapper passes a globally-reversed copy of the probe array as a
# second blocked input whose index map mirrors the grid (block i of the
# forward array reversed == block nblocks-1-i of the reversed array).


def _bitonic_merge(planes, side, rows):
    """Sort (rows,128) planes holding a bitonic sequence (first half
    ascending, second half descending) by (key, side) ascending; planes[0]
    is the key, all planes move together. Returns (planes, side)."""
    flat = _row_iota((rows, LANES)) * LANES + _lane_iota((rows, LANES))
    total = rows * LANES
    s = total // 2
    while s >= 1:
        lower = (flat % (2 * s)) < s
        key = planes[0]
        kd, sd = _shift_down(key, s, rows), _shift_down(side, s, rows)
        ku, su = _shift_up(key, s, rows), _shift_up(side, s, rows)
        down_lt = (kd < key) | ((kd == key) & (sd < side))
        up_gt = (ku > key) | ((ku == key) & (su > side))
        take_down = lower & down_lt
        take_up = (~lower) & up_gt
        planes = [
            jnp.where(take_down, _shift_down(p, s, rows),
                      jnp.where(take_up, _shift_up(p, s, rows), p))
            for p in planes
        ]
        side = jnp.where(take_down, sd, jnp.where(take_up, su, side))
        s //= 2
    return planes, side


def _propagate_forward(has, vals, rows):
    """In-VMEM forward-fill of vals from the most recent has==1 position."""
    flat = _row_iota((rows, LANES)) * LANES + _lane_iota((rows, LANES))
    total = rows * LANES
    s = 1
    while s < total:
        sh = jnp.where(flat >= s, _shift_up(has, s, rows), 0)
        take = (has == 0) & (sh == 1)
        vals = [jnp.where(take, _shift_up(v, s, rows), v) for v in vals]
        has = has | sh
        s *= 2
    return has, vals


def _merge_probe_kernel(n_pay, r, n_rchunks, left_ref, left_rev_ref, right_keys, *refs):
    # refs: right payload ANY refs (n_pay); outputs (has, pkey, ppay*);
    # scratch: rbufs (1+n_pay of (r,128)), tailbuf (1,128),
    #          route planes (2+n_pay of (2r,128) u32), route_d (2r,128) i32,
    #          carry SMEM (2+n_pay), sem
    n_bp = 1 + n_pay
    rpay_refs = refs[:n_pay]
    has_out = refs[n_pay]
    pkey_out = refs[n_pay + 1]
    ppay_out = list(refs[n_pay + 2 : n_pay + 2 + n_pay])
    sc = list(refs[n_pay + 2 + n_pay :])
    rbufs = sc[:n_bp]
    tailbuf = sc[n_bp]
    route = sc[n_bp + 1 : n_bp + 1 + (2 + n_pay)]
    route_d = sc[n_bp + 1 + (2 + n_pay)]
    carry = sc[n_bp + 2 + (2 + n_pay)]  # SMEM: [jcur, has, key, pays...]
    sem = sc[n_bp + 3 + (2 + n_pay)]

    i = pl.program_id(0)
    rows2 = 2 * r

    @pl.when(i == 0)
    def _():
        carry[0] = 0  # jcur
        carry[1] = 0  # carry-has

    lk = left_ref[:]
    min_l = lk[0, 0]
    max_l = lk[r - 1, LANES - 1]

    # ---- fold chunks wholly below this probe block into the scalar carry
    def fold_cond(state):
        j, cont = state
        return (j < n_rchunks) & (cont == 1)

    def fold_body(state):
        j, _ = state
        rd = pltpu.make_async_copy(
            right_keys.at[pl.ds((j + 1) * r - 1, 1)], tailbuf, sem
        )
        rd.start()
        rd.wait()
        cmax = tailbuf[0, LANES - 1]
        fold = cmax <= min_l

        @pl.when(fold)
        def _():
            carry[0] = j + 1
            carry[1] = 1
            carry[2] = cmax.astype(jnp.int32)
            for k in range(n_pay):
                rp = pltpu.make_async_copy(
                    rpay_refs[k].at[pl.ds((j + 1) * r - 1, 1)], tailbuf, sem
                )
                rp.start()
                rp.wait()
                carry[3 + k] = tailbuf[0, LANES - 1].astype(jnp.int32)

        return (j + 1, fold.astype(jnp.int32))

    jax.lax.while_loop(fold_cond, fold_body, (carry[0], jnp.int32(1)))

    # ---- seed best-so-far from the carry
    bh = jnp.zeros((r, LANES), jnp.int32) + carry[1]
    bk = jnp.zeros((r, LANES), jnp.uint32) + carry[2].astype(jnp.uint32)
    bp = [
        jnp.zeros((r, LANES), jnp.uint32) + carry[3 + k].astype(jnp.uint32)
        for k in range(n_pay)
    ]

    # ---- straddling chunks: per-element merge-probe
    half = _row_iota((rows2, LANES)) < r  # first-half mask of merged block
    lk_rev = left_rev_ref[:]

    def str_cond(state):
        j, cont = state[0], state[1]
        return (j < n_rchunks) & (cont == 1)

    def str_body(state):
        j, _, bh, bk, *bp = state
        rd = pltpu.make_async_copy(right_keys.at[pl.ds(j * r, r)], rbufs[0], sem)
        rd.start()
        rd.wait()
        for k in range(n_pay):
            rp = pltpu.make_async_copy(
                rpay_refs[k].at[pl.ds(j * r, r)], rbufs[1 + k], sem
            )
            rp.start()
            rp.wait()
        rmin = rbufs[0][0, 0]
        proceed = (rmin <= max_l).astype(jnp.int32)

        # bitonic input planes: [build chunk asc | probe block reversed],
        # staged through the (2r,128) route scratch planes (no concatenate)
        route[0][pl.ds(0, r)] = rbufs[0][:]
        route[0][pl.ds(r, r)] = lk_rev
        key_m = route[0][:]
        side_m = jnp.where(half, 0, 1)
        pay_m = []
        for k in range(n_pay):
            route[1][pl.ds(0, r)] = rbufs[1 + k][:]
            route[1][pl.ds(r, r)] = jnp.zeros((r, LANES), jnp.uint32)
            pay_m.append(route[1][:])
        planes, sside = _bitonic_merge([key_m, *pay_m], side_m, rows2)
        mkey = planes[0]
        mpays = planes[1:]
        is_build = (sside == 0).astype(jnp.int32)
        phas, pvals = _propagate_forward(
            is_build,
            [jnp.where(is_build == 1, mkey, 0)]
            + [jnp.where(is_build == 1, p, 0) for p in mpays],
            rows2,
        )
        # extract probe rows back into probe order (order-preserving
        # concentration of the probe lanes)
        is_probe = 1 - is_build
        prefix = _inclusive_scan_rowmajor(is_probe)
        flat2 = _row_iota((rows2, LANES)) * LANES + _lane_iota((rows2, LANES))
        # hole encoding 0 (run_butterfly's contract): probe packets move
        # down by d >= 0; d == 0 (already placed) and holes coincide safely.
        d = jnp.where(is_probe == 1, flat2 - (prefix - 1), 0)
        route[0][:] = phas.astype(jnp.uint32)
        route[1][:] = pvals[0]
        for k in range(n_pay):
            route[2 + k][:] = pvals[1 + k]
        route_d[:] = d
        run_butterfly(route, route_d, rows2)
        cand_has = route[0][pl.ds(0, r)].astype(jnp.int32)
        cand_key = route[1][pl.ds(0, r)]
        cand_pay = [route[2 + k][pl.ds(0, r)] for k in range(n_pay)]

        better = (proceed == 1) & (cand_has == 1) & ((bh == 0) | (cand_key >= bk))
        bh = jnp.where(better, 1, bh)
        bk = jnp.where(better, cand_key, bk)
        bp = [jnp.where(better, c, b) for c, b in zip(cand_pay, bp)]
        return (j + 1, proceed, bh, bk, *bp)

    state = (carry[0], jnp.int32(1), bh, bk, *bp)
    state = jax.lax.while_loop(str_cond, str_body, state)
    bh, bk = state[2], state[3]
    bp = list(state[4:])

    has_out[:] = bh
    pkey_out[:] = jnp.where(bh == 1, bk, EMPTY)
    for o, b in zip(ppay_out, bp):
        o[:] = jnp.where(bh == 1, b, 0)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def merge_probe_pallas(
    left_sorted: jnp.ndarray,
    right_sorted: jnp.ndarray,
    right_payloads: tuple,
    block_rows: int = DEF_R,
    interpret: bool = False,
):
    """For each left element (sorted asc): (has, greatest right key <= it,
    its payloads). Both inputs sorted ascending; right keys unique; keys
    must not use the 0xFFFFFFFF padding sentinel."""
    r = block_rows
    csz = r * LANES
    nl, nr = left_sorted.shape[0], right_sorted.shape[0]
    pad_l = (-nl) % csz
    pad_r = (-nr) % csz
    lk = left_sorted
    if pad_l:
        lk = jnp.concatenate([lk, jnp.full((pad_l,), EMPTY, jnp.uint32)])
    rk = right_sorted
    rp = list(right_payloads)
    if pad_r:
        rk = jnp.concatenate([rk, jnp.full((pad_r,), EMPTY, jnp.uint32)])
        rp = [jnp.concatenate([p, jnp.zeros((pad_r,), jnp.uint32)]) for p in rp]
    n_pay = len(rp)
    nlp, nrp = nl + pad_l, nr + pad_r
    n_lblocks = nlp // csz
    n_rchunks = nrp // csz

    lk2 = lk.reshape(nlp // LANES, LANES)
    lk2_rev = jnp.flip(lk).reshape(nlp // LANES, LANES)  # XLA-side reversal
    rk2 = rk.reshape(nrp // LANES, LANES)
    rp2 = [p.reshape(nrp // LANES, LANES) for p in rp]

    blocked = lambda: pl.BlockSpec((r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mirrored = pl.BlockSpec(
        (r, LANES), lambda i: (n_lblocks - 1 - i, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(_merge_probe_kernel, n_pay, r, n_rchunks),
        grid=(n_lblocks,),
        in_specs=[blocked(), mirrored, pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_pay)],
        out_shape=(
            jax.ShapeDtypeStruct((nlp // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nlp // LANES, LANES), jnp.uint32),
            *[
                jax.ShapeDtypeStruct((nlp // LANES, LANES), jnp.uint32)
                for _ in range(n_pay)
            ],
        ),
        out_specs=(blocked(), blocked(), *[blocked() for _ in range(n_pay)]),
        scratch_shapes=(
            [pltpu.VMEM((r, LANES), jnp.uint32) for _ in range(1 + n_pay)]
            + [pltpu.VMEM((1, LANES), jnp.uint32)]
            + [pltpu.VMEM((2 * r, LANES), jnp.uint32) for _ in range(2 + n_pay)]
            + [
                pltpu.VMEM((2 * r, LANES), jnp.int32),
                pltpu.SMEM((3 + n_pay,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lk2, lk2_rev, rk2, *rp2)
    has = outs[0].reshape(nlp)[:nl] != 0
    pkey = outs[1].reshape(nlp)[:nl]
    pays = tuple(o.reshape(nlp)[:nl] for o in outs[2:])
    return has, pkey, pays
