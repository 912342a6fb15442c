"""Pallas TPU kernel: stable filter compaction, v2 (search + gather).

MEASURED NEGATIVE RESULT (round 4; re-measured interleaved in round 5,
MEASURE_FILTER.json v3 section): on v5e this loses to the v1 butterfly —
0.678ms vs 0.596ms at 8Mi/r256 and 7.25ms vs 5.76ms at 64Mi, same-process
chained A/B. The op-count model
predicted ~2x fewer vector ops, but in-kernel `take_along_axis` gathers
cost ~14 roll/select-equivalents each (they do not pipeline on the VPU the
way roll+select chains do), and this design issues 7 search gathers + 1
apply gather + nchunks*(nchunks+1) P2 gathers per block. v1's butterfly
levels pipeline at ~0.6us/2Mi per vector op, which no gather-based
decomposition beats at these shapes. Kept because the structure (and its
exhaustive tests) documents the design space; do NOT wire it into the
dispatch without re-measuring on newer hardware/toolchains.

v1 routes packets through log2(block_elems) ~ 16 roll/select levels
(~120 vector ops per block); this kernel instead uses two Mosaic
primitives that are cheap per PASS but not per OP (MEASURE_FILTER.json ops
section, CLAUDE.md kernel notes):

  * ``take_along_axis(axis=1)`` — an arbitrary per-row 128-lane permutation
    in ONE pass (indices must be shaped like the source, lane dim 128).
  * (128,128) 32-bit transposes — lower cleanly (measurements/_proto_lower.py).

The compaction out[t] = in[sel(t)] is decomposed into two gathers with a
transpose between (out = P2 . T . P1):

  P1 (in-row): X[i, t] = the element of input row i that lands at LANE t of
     its destination row: X = gather(blk, p) where p[i,t] = position of the
     (j'+1)-th kept lane of row i, j' = (t - phase_i) mod 128. p is found by
     a 7-step branchless binary search over the row's inclusive prefix Q
     (p = #{l : Q[i,l] <= j'}), each step one lane gather + compare.
  P2 (cross-row): out[q, t] = X[src(q,t), t]. src is the index of the row
     whose output interval [G_i, G_{i+1}) covers global position 128q+t:
     src(q,t) = #{i : G_{i+1} <= 128q+t} — a RANK, computed exactly on the
     MXU as one (128,R)@(R,R_out) bf16 matmul plus a prefix row (counts
     <= R <= 256 are bf16-exact; f32 accumulation exact < 2^24). The gather
     runs in transposed space ((128,128) tiles), then tiles transpose back.

Cross-block state: the running output offset rides in SMEM (sequential
grid), and the shared partial output row is carried in a VMEM scratch row
instead of v1's per-block HBM read-modify-write — no DMA round-trip.

Reference analog: dpu/shared/kernels/filter.c:28-55,100-131 (tasklet
handshake chain + aligned-write fix-ups). Same roles: SMEM offset carry =
handshake running count; VMEM carry row = the deferred odd-element fix-up.

Contract is identical to v1: (padded_out[, padded_sel], count), padded
tails are garbage, order-preserving (stable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEF_R = 256  # rows per block; must be a multiple of 128 (tile-wise P2)


def _iota(shape, dim, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, shape, dim)


def _inrow_prefix(mask_bf):
    """Inclusive in-row prefix of a 0/1 (R,128) bf16 mask on the MXU."""
    u = (
        _iota((LANES, LANES), 0) <= _iota((LANES, LANES), 1)
    ).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        mask_bf, u, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row_scan(k_bf, r, inclusive):
    """(R,1) prefix over rows of per-row counts, via (R,R) triangular
    matmul. k entries <= 128 are bf16-exact; sums < 2^24 exact in f32."""
    cmp = _iota((r, r), 0) > _iota((r, r), 1) if not inclusive else (
        _iota((r, r), 0) >= _iota((r, r), 1)
    )
    return jax.lax.dot_general(
        cmp.astype(jnp.bfloat16), k_bf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _search_kept(q_prefix, jq):
    """p[i,t] = #{l : q_prefix[i,l] <= jq[i,t]} by branchless binary search
    (7 lane-gather steps). q_prefix rows are non-decreasing so the predicate
    is a prefix property; p in [0,128], capped at 127 here (out-of-range
    slots are never selected downstream)."""
    p = jnp.zeros_like(jq)
    for step in (64, 32, 16, 8, 4, 2, 1):
        t2 = p + step
        qv = jnp.take_along_axis(q_prefix, t2 - 1, axis=1)
        p = jnp.where(qv <= jq, t2, p)
    return jnp.minimum(p, LANES - 1)


def _filter2_kernel(threshold, with_indices, x_ref, *refs):
    n_out = 2 if with_indices else 1
    outs = list(refs[:n_out])
    count_ref = refs[n_out]
    sc = list(refs[n_out + 1 :])
    wouts = sc[:n_out]            # assembled output windows (R+128,128)
    carries = sc[n_out : 2 * n_out]  # (1,128) partial-row carries
    off_ref = sc[2 * n_out]
    sem = sc[2 * n_out + 1]

    i = pl.program_id(0)
    r = x_ref.shape[0]
    nchunks = r // LANES
    ntiles = nchunks + 1  # output window = R+128 rows
    rout = ntiles * LANES

    @pl.when(i == 0)
    def _():
        off_ref[0] = 0
        for c in carries:
            c[...] = jnp.zeros((1, LANES), jnp.uint32)

    offset = off_ref[0]
    phase0 = jax.lax.rem(offset, LANES)
    row0 = jax.lax.div(offset, LANES)

    blk = x_ref[:]
    mask = blk < jnp.uint32(threshold)
    mask_bf = mask.astype(jnp.bfloat16)

    q_prefix = _inrow_prefix(mask_bf).astype(jnp.int32)  # (R,128) inclusive
    k = q_prefix[:, LANES - 1 :]                         # (R,1) row counts
    k_excl = _row_scan(k.astype(jnp.bfloat16), r, inclusive=False)
    k_excl = k_excl.astype(jnp.int32)                    # (R,1)
    k_incl = k_excl + k
    cnt = k_incl[r - 1, 0]

    # ---- P1: in-row gather to destination lanes ----
    h_excl = phase0 + k_excl                             # (R,1) run starts
    phase_i = jax.lax.rem(h_excl, LANES)
    jq = jax.lax.rem(_iota((r, LANES), 1) - phase_i + LANES, LANES)
    p = _search_kept(q_prefix, jq)
    x1 = jnp.take_along_axis(blk, p, axis=1)             # (R,128)
    planes = [x1]
    if with_indices:
        base = (i * r + _iota((r, LANES), 0)) * LANES + p
        planes.append(base.astype(jnp.uint32))

    # ---- P2: cross-row gather via MXU rank, in transposed tiles ----
    h_incl = phase0 + k_incl                             # (R,1) run ends
    rh = jax.lax.div(h_incl, LANES)                      # (R,1) end row
    eh_t = jax.lax.rem(jnp.swapaxes(h_incl, 0, 1), LANES)  # (1,R) end lane
    # [H_i <= 128q+t] = [rh_i < q] + [rh_i == q][eh_i <= t]
    w_t = (eh_t <= _iota((LANES, r), 0)).astype(jnp.bfloat16)  # (128,R)
    a = (rh == _iota((r, rout), 1)).astype(jnp.bfloat16)       # (R,rout)
    term2 = jax.lax.dot_general(
        w_t, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                    # (128,rout)
    colsum = jax.lax.dot_general(
        jnp.ones((1, r), jnp.bfloat16), a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (1,rout)
    us = (_iota((rout, rout), 0) < _iota((rout, rout), 1)).astype(jnp.bfloat16)
    r0 = jax.lax.dot_general(
        colsum.astype(jnp.bfloat16), us, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (1,rout)
    src = (term2 + r0).astype(jnp.int32)                 # (128,rout)

    lane1 = _iota((1, LANES), 1)
    for plane, wout, carry, o in zip(planes, wouts, carries, outs):
        chunks = [
            jnp.swapaxes(plane[128 * c : 128 * (c + 1)], 0, 1)
            for c in range(nchunks)
        ]  # each (128,128): X_T[:, 128c:128(c+1)]
        for t in range(ntiles):
            st = src[:, 128 * t : 128 * (t + 1)]         # (128,128)
            local = st & (LANES - 1)
            csel = jax.lax.shift_right_logical(st, 7)
            tile = jnp.zeros((LANES, LANES), jnp.uint32)
            for c in range(nchunks):
                g = jnp.take_along_axis(chunks[c], local, axis=1)
                tile = jnp.where(csel == c, g, tile)
            wout[pl.ds(128 * t, 128)] = jnp.swapaxes(tile, 0, 1)
        # merge the carried partial row, then refresh the carry
        wout[pl.ds(0, 1)] = jnp.where(
            lane1 < phase0, carry[...], wout[pl.ds(0, 1)]
        )
        carry[...] = wout[pl.ds(jax.lax.div(phase0 + cnt, LANES), 1)]

    # ---- data-proportional chunked DMA append ----
    nrows_w = jax.lax.div(phase0 + cnt + (LANES - 1), LANES)
    ch = rout // 4
    for stage in ("start", "wait"):
        for j in range(4):
            @pl.when(j * ch < nrows_w)
            def _(j=j, stage=stage):
                for wout, o in zip(wouts, outs):
                    cp = pltpu.make_async_copy(
                        wout.at[pl.ds(j * ch, ch)],
                        o.at[pl.ds(row0 + j * ch, ch)],
                        sem,
                    )
                    if stage == "start":
                        cp.start()
                    else:
                        cp.wait()

    off_ref[0] = offset + cnt

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        count_ref[0] = offset + cnt


def _call(values, threshold, with_indices, block_rows, interpret):
    n = values.shape[0]
    # bf16 exactness bound: the P2 rank matmul feeds per-block row counts
    # (up to r) through bf16, where integers > 256 are not representable —
    # clamp like v1's with-indices wrapper does.
    r = min(block_rows, 256)
    while r > LANES and n % (r * LANES):
        r //= 2
    assert r % LANES == 0 and n % (r * LANES) == 0, (
        f"n={n} must be a multiple of {r * LANES} (v2 needs 128-row tiles)"
    )
    nrows = n // LANES
    nblocks = nrows // r
    x = values.reshape(nrows, LANES)
    rout = r + LANES

    n_out = 2 if with_indices else 1
    out_shapes = tuple(
        jax.ShapeDtypeStruct((nrows + rout, LANES), jnp.uint32)
        for _ in range(n_out)
    ) + (jax.ShapeDtypeStruct((1,), jnp.int32),)
    out_specs = tuple(
        pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)
    ) + (pl.BlockSpec(memory_space=pltpu.SMEM),)
    scratch = (
        [pltpu.VMEM((rout, LANES), jnp.uint32) for _ in range(n_out)]
        + [pltpu.VMEM((1, LANES), jnp.uint32) for _ in range(n_out)]
        + [pltpu.SMEM((1,), jnp.int32), pltpu.SemaphoreType.DMA(())]
    )

    res = pl.pallas_call(
        functools.partial(_filter2_kernel, int(threshold), with_indices),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x)
    outs = [res[j][:nrows].reshape(n) for j in range(n_out)]
    count = res[n_out][0].astype(jnp.uint32)
    return (*outs, count)


@functools.partial(
    jax.jit, static_argnames=("threshold", "block_rows", "interpret")
)
def filter_compact_pallas2(
    values, threshold=None, block_rows: int = DEF_R, interpret: bool = False
):
    """Stable compaction of values < threshold; returns (padded, count).
    padded[:count] = passing values in order; padded[count:] is garbage."""
    from .filter import FILTER_THRESHOLD

    if threshold is None:
        threshold = FILTER_THRESHOLD
    return _call(values, threshold, False, block_rows, interpret)


@functools.partial(
    jax.jit, static_argnames=("threshold", "block_rows", "interpret")
)
def filter_with_indices_pallas2(
    values, threshold=None, block_rows: int = DEF_R, interpret: bool = False
):
    """Selection-vector variant: compacts values AND their original flat
    indices. Returns (padded_values, padded_indices, count)."""
    from .filter import FILTER_THRESHOLD

    if threshold is None:
        threshold = FILTER_THRESHOLD
    return _call(values, threshold, True, block_rows, interpret)
