"""Pallas TPU kernel: in-block bitonic merge stage cascade.

Completes a bitonic merge whose cross-block stages (compare-exchange
distance d >= block) already ran as layout-clean 2-D XLA passes
(ops/merge_xla.bitonic_merge): after those, every block is itself bitonic
and inter-block ordered, so each block finishes independently with its
internal cascade d = block/2 .. 1 — 16 stages fused into ONE pass over HBM
instead of 16 XLA materializations (measured 36.7ms for a pure-XLA 4Mi
merge: stages with d < 128 hit pathological sub-lane-width layouts).

Stage structure per block (R rows x 128 lanes, row-major order):
  d >= 128: partners are d/128 rows apart — sublane rolls.
  d  < 128: 2d <= 128 so partners share a row — lane rolls; wrapped lanes
            are never selected (pair groups are 2d-aligned within the row).

Reference analog: none — the reference has no merge primitive; this serves
the sorted-build join specialization (ops/merge_xla.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEF_R = 512  # rows per block -> 64Ki elements


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _merge_block_kernel(n_pay, *refs):
    k_in = refs[0]
    p_in = refs[1 : 1 + n_pay]
    k_out = refs[1 + n_pay]
    p_out = refs[2 + n_pay : 2 + 2 * n_pay]

    r = k_in.shape[0]
    # Mosaic has no unsigned min/max (arith.minui unlowerable); ^0x80000000
    # maps uint32 order onto int32 order bit-exactly (same-width astype is a
    # bitcast), so the whole cascade runs signed.
    k = (k_in[:] ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    ps = [p[:] for p in p_in]
    lane = _lane_iota((r, LANES))
    row = _row_iota((r, LANES))

    d = (r * LANES) // 2
    while d >= 1:
        if d >= LANES:
            rr = d // LANES
            up_k = pltpu.roll(k, r - rr, 0)
            dn_k = pltpu.roll(k, rr, 0)
            up_p = [pltpu.roll(p, r - rr, 0) for p in ps]
            dn_p = [pltpu.roll(p, rr, 0) for p in ps]
            sel_lo = (row & rr) == 0
        else:
            up_k = pltpu.roll(k, LANES - d, 1)
            dn_k = pltpu.roll(k, d, 1)
            up_p = [pltpu.roll(p, LANES - d, 1) for p in ps]
            dn_p = [pltpu.roll(p, d, 1) for p in ps]
            sel_lo = (lane & d) == 0
        m_lo = k <= up_k  # lo slot keeps its pair on ties
        m_hi = k >= dn_k  # hi slot keeps its pair on ties
        new_k = jnp.where(sel_lo, jnp.minimum(k, up_k), jnp.maximum(k, dn_k))
        ps = [
            jnp.where(
                sel_lo,
                jnp.where(m_lo, p, up),
                jnp.where(m_hi, p, dn),
            )
            for p, up, dn in zip(ps, up_p, dn_p)
        ]
        k = new_k
        d //= 2

    k_out[:] = k.astype(jnp.uint32) ^ jnp.uint32(0x80000000)
    for o, p in zip(p_out, ps):
        o[:] = p


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def bitonic_merge_blocks(
    planes: tuple,
    block_rows: int = DEF_R,
    interpret: bool = False,
):
    """Run the in-block bitonic cascade (d = block/2..1) on each
    block_rows*128 block independently. planes[0] is the uint32 key; others
    follow. Correct iff each block is already bitonic (the cross-block
    stages ran first)."""
    n = planes[0].shape[0]
    r = block_rows
    assert n % (r * LANES) == 0, f"n={n} not a multiple of {r * LANES}"
    nrows = n // LANES
    nblocks = nrows // r
    n_pay = len(planes) - 1
    v2 = [p.reshape(nrows, LANES) for p in planes]

    blocked = lambda: pl.BlockSpec(
        (r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_merge_block_kernel, n_pay),
        grid=(nblocks,),
        in_specs=[blocked() for _ in v2],
        out_shape=tuple(
            jax.ShapeDtypeStruct((nrows, LANES), p.dtype) for p in v2
        ),
        out_specs=tuple(blocked() for _ in v2),
        interpret=interpret,
    )(*v2)
    return tuple(o.reshape(n) for o in out)
