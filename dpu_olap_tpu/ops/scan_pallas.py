"""Pallas TPU kernel: forward "last-alive" propagation (segmented fill).

out[q] = value at the largest q' <= q where alive[q'], per carried array —
the workhorse of the co-sort join (ops/join.py): after sorting [pk | fk] by
(key, side), every fk row needs the nearest preceding pk row's key/payload.
jax.lax.associative_scan with a custom combine generates an enormous sliced
graph that the TPU compiler chokes on at 4Mi+ elements; this kernel is a
single HBM pass: within-block Hillis-Steele propagation over (rows,128)
blocks via lane/sublane rolls, with the inter-block carry held in SMEM across
the sequential grid (the same carry idiom as the filter kernel's running
offset, ops/filter_pallas.py).

Reference analog: none directly — the reference's probe walks a hash table
per element (hash_probe.c); propagation-after-sort is the TPU-native
restatement of "find my build-side row".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEF_R = 256  # 32Ki elements per grid step


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _shift_up(arr, s, rows):
    """result[q] = arr[q - s] over row-major flattened (rows,128); positions
    with q < s receive wrapped garbage (callers mask via flat >= s)."""
    if s % LANES == 0:
        return pltpu.roll(arr, s // LANES, 0)
    a = pltpu.roll(arr, s, 1)  # a(r,l) = arr(r, (l-s)%128)
    b = pltpu.roll(a, 1, 0)  # previous-row carry
    lane = _lane_iota(arr.shape)
    return jnp.where(lane >= s, a, b)


def _propagate_kernel(n_vals, alive_ref, *refs):
    # refs = (*val_in, has_out, *val_out, carry_smem)
    val_in = refs[:n_vals]
    has_out = refs[n_vals]
    val_out = refs[n_vals + 1 : 2 * n_vals + 1]
    carry = refs[2 * n_vals + 1]  # SMEM (n_vals + 1,): [has, v0, v1, ...]

    i = pl.program_id(0)
    r = alive_ref.shape[0]

    @pl.when(i == 0)
    def _():
        carry[0] = 0

    has = (alive_ref[:] != 0).astype(jnp.int32)
    vals = [v[:] for v in val_in]
    flat = _row_iota((r, LANES)) * LANES + _lane_iota((r, LANES))

    total = r * LANES
    s = 1
    while s < total:
        sh_has = jnp.where(flat >= s, _shift_up(has, s, r), 0)
        take = (has == 0) & (sh_has == 1)
        vals = [jnp.where(take, _shift_up(v, s, r), v) for v in vals]
        has = has | sh_has
        s *= 2

    # splice in the previous blocks' carry for the prefix before the first
    # alive element
    chas = carry[0]
    take0 = (has == 0) & (chas == 1)
    # same-width integer converts are bit-preserving (two's complement), so
    # uint32 payloads round-trip the int32 SMEM carry exactly (scalar bitcast
    # is not lowerable in Mosaic)
    vals = [
        jnp.where(take0, carry[1 + k].astype(v.dtype), v)
        for k, v in enumerate(vals)
    ]
    has = jnp.where(take0, 1, has)

    has_out[:] = has
    for o, v in zip(val_out, vals):
        o[:] = v

    # update carry from the block's final position
    carry[0] = has[r - 1, LANES - 1]
    for k, v in enumerate(vals):
        carry[1 + k] = v[r - 1, LANES - 1].astype(jnp.int32)


def _propagate_fill_kernel(n_vals, sentinel, *refs):
    # refs = (*val_in, *val_out, carry_smem); plane 0 is the key plane whose
    # != sentinel marks alive positions.
    val_in = refs[:n_vals]
    val_out = refs[n_vals : 2 * n_vals]
    carry = refs[2 * n_vals]  # SMEM (n_vals,) int32

    i = pl.program_id(0)
    r = val_in[0].shape[0]
    snt = jnp.uint32(sentinel)

    @pl.when(i == 0)
    def _():
        for j in range(n_vals):
            carry[j] = jnp.uint32(sentinel).astype(jnp.int32)

    k = val_in[0][:]
    pays = [v[:] for v in val_in[1:]]
    lane = _lane_iota((r, LANES))

    # Level 1 — within-row forward fill (7 Hillis-Steele lane steps). A
    # position whose key is still sentinel takes the (key, payloads) pair
    # from distance s in the same step, so filled pairs stay consistent;
    # pay lanes under a still-sentinel key may hold garbage (masked later).
    s = 1
    while s < LANES:
        cand_k = jnp.where(lane >= s, pltpu.roll(k, s, 1), snt)
        cand_p = [pltpu.roll(p, s, 1) for p in pays]
        take = k == snt
        k = jnp.where(take, cand_k, k)
        pays = [jnp.where(take, cp, p) for cp, p in zip(cand_p, pays)]
        s *= 2

    # Level 2 — row carries: lane 127 now holds each row's last filled pair
    # (or sentinel). Forward-fill the (R,1) carry columns over sublanes —
    # 1/128 of the data, log2(R) steps.
    ck = k[:, LANES - 1 :]
    cp = [p[:, LANES - 1 :] for p in pays]
    row = _row_iota((r, 1))
    s = 1
    while s < r:
        cand_k = jnp.where(row >= s, pltpu.roll(ck, s, 0), snt)
        cand_p = [pltpu.roll(p, s, 0) for p in cp]
        take = ck == snt
        ck = jnp.where(take, cand_k, ck)
        cp = [jnp.where(take, x, p) for x, p in zip(cand_p, cp)]
        s *= 2

    # prev-row carry; wherever the intra-block predecessor rows carry
    # nothing (prev still sentinel — row 0 and any all-dead prefix), fall
    # back to the cross-block SMEM carry. Same-width integer converts are
    # bit-exact (scalar bitcast is not lowerable in Mosaic).
    prev_k = pltpu.roll(ck, 1, 0)
    prev_p = [pltpu.roll(p, 1, 0) for p in cp]
    prev_dead = (row == 0) | (prev_k == snt)
    prev_k = jnp.where(prev_dead, carry[0].astype(jnp.uint32), prev_k)
    prev_p = [
        jnp.where(prev_dead, carry[1 + j].astype(jnp.uint32), p)
        for j, p in enumerate(prev_p)
    ]

    # Splice: lanes before a row's first alive position are exactly those
    # still at sentinel after level 1.
    take0 = k == snt
    out_k = jnp.where(take0, prev_k, k)
    out_p = [jnp.where(take0, pp, p) for pp, p in zip(prev_p, pays)]

    val_out[0][:] = out_k
    for o, v in zip(val_out[1:], out_p):
        o[:] = v

    carry[0] = out_k[r - 1, LANES - 1].astype(jnp.int32)
    for j, v in enumerate(out_p):
        carry[1 + j] = v[r - 1, LANES - 1].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("sentinel", "block_rows", "interpret"))
def propagate_fill(
    values: tuple,
    sentinel: int = 0xFFFFFFFF,
    block_rows: int = 2 * DEF_R,
    interpret: bool = False,
):
    """Forward-fill ``values`` from the most recent position where
    values[0] != sentinel (values[0] is the key plane; its sentinel lanes
    mark dead positions). Returns the filled tuple; has = filled[0] !=
    sentinel. ~3x the generic propagate_last: two-level fill (7 lane steps +
    log2(R) sublane steps on 1/128 of the data) instead of log2(block) full
    Hillis-Steele levels, and no separate alive plane.

    All planes uint32, same length, n a multiple of block_rows*128.
    """
    n = values[0].shape[0]
    r = block_rows
    assert n % (r * LANES) == 0, f"n={n} not a multiple of {r * LANES}"
    nrows = n // LANES
    nblocks = nrows // r
    n_vals = len(values)
    v2 = [v.reshape(nrows, LANES) for v in values]

    blocked = lambda: pl.BlockSpec(
        (r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_propagate_fill_kernel, n_vals, int(sentinel)),
        grid=(nblocks,),
        in_specs=[blocked() for _ in range(n_vals)],
        out_shape=tuple(
            jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32) for _ in v2
        ),
        out_specs=tuple(blocked() for _ in range(n_vals)),
        scratch_shapes=[pltpu.SMEM((n_vals,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: SMEM carry
        ),
        interpret=interpret,
    )(*v2)
    return tuple(o.reshape(n) for o in out)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def propagate_last(
    alive: jnp.ndarray,
    values: tuple,
    block_rows: int = DEF_R,
    interpret: bool = False,
):
    """Forward-fill each values[k] from the most recent alive position.

    alive: (n,) bool/int; values: tuple of (n,) uint32/int32 arrays.
    Returns (has, filled_values): has[q]=False where no alive q' <= q exists
    (those lanes are 0-filled). n must be a multiple of block_rows*128
    (callers pad; the join pads with dead lanes).
    """
    n = alive.shape[0]
    r = block_rows
    assert n % (r * LANES) == 0, f"n={n} not a multiple of {r * LANES}"
    nrows = n // LANES
    nblocks = nrows // r
    n_vals = len(values)

    a2 = alive.astype(jnp.int32).reshape(nrows, LANES)
    v2 = [v.reshape(nrows, LANES) for v in values]

    blocked = lambda: pl.BlockSpec((r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_propagate_kernel, n_vals),
        grid=(nblocks,),
        in_specs=[blocked()] + [blocked() for _ in range(n_vals)],
        out_shape=(
            jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
            *[jax.ShapeDtypeStruct((nrows, LANES), v.dtype) for v in v2],
        ),
        out_specs=(blocked(), *[blocked() for _ in range(n_vals)]),
        scratch_shapes=[pltpu.SMEM((n_vals + 1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: SMEM carry
        ),
        interpret=interpret,
    )(a2, *v2)
    has = out[0].reshape(n) != 0
    filled = tuple(o.reshape(n) for o in out[1:])
    return has, filled
