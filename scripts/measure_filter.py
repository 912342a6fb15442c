"""Round-4 filter-kernel measurement campaign (VERDICT item 2).

Dissects where the Pallas filter's time goes before redesigning it:
  e2e    — filter_compact_pallas at 8Mi (VMEM-assisted chain regime) and
           64Mi (HBM-honest) across block_rows.
  parts  — stage-ablated kernel variants on the same grid/IO skeleton:
           copy (pure IO), mask+count, +MXU prefix, +within-row butterfly
           levels only, full butterfly. Differences attribute cost.
  ops    — in-kernel primitive throughput on (R,128) i32 blocks: lane roll,
           row roll, where-select, and jnp.take_along_axis(axis=1) lane
           gather (verified against interpret mode first — the round-3
           lanegather cells were DCE-poisoned).

Appends to MEASURE_FILTER.json. Usage: python scripts/measure_filter.py
[e2e parts ops ...]
"""

import functools
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from dpu_olap_tpu.bench.device_time import time_chained  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "MEASURE_FILTER.json"
results = {}
if OUT.exists():
    results = json.loads(OUT.read_text())

ROOFLINE_GBPS = 900.0
LANES = 128


def record(section, name, ms, note="", nbytes=None):
    entry = {"ms": ms, "note": note}
    floor_ms = 0.004
    if nbytes is not None:
        floor_ms = max(floor_ms, nbytes / (ROOFLINE_GBPS * 1e9) * 1e3)
    if ms < floor_ms:
        entry["suspect_dce"] = True
        entry["floor_ms"] = floor_ms
        print(f"[{section}] {name}: {ms:.6f} ms BELOW FLOOR {floor_ms:.4f}"
              " — DCE suspect", flush=True)
    else:
        print(f"[{section}] {name}: {ms:.4f} ms  {note}", flush=True)
    results.setdefault(section, {})[name] = entry
    OUT.write_text(json.dumps(results, indent=1))


def measure_e2e():
    from dpu_olap_tpu.ops.filter_pallas import filter_compact_pallas

    for n, tag, k in ((8 << 20, "8Mi", 64), (64 << 20, "64Mi", 8)):
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32)
        )
        jax.block_until_ready(x)
        for r in (64, 128, 256, 512):
            def step(c, r=r):
                out, cnt = filter_compact_pallas(c, block_rows=r)
                return c ^ (out & jnp.uint32(1)) ^ cnt.astype(jnp.uint32)

            sec = time_chained(step, x, k=k)
            record("e2e", f"r{r}_{tag}", sec * 1e3,
                   f"{n*4/sec/1e9:.0f} GB/s", nbytes=n * 4)
        del x


def measure_v3():
    """Round-5 A/B: v1 (flattened butterfly) vs v3 (lane levels + rotation
    gather + row levels) vs v2 (search+gather, the citation fix) —
    INTERLEAVED in one process via time_chained_multi so drift cannot land
    in either side (CLAUDE.md cross-process-variance gotcha)."""
    from dpu_olap_tpu.bench.device_time import time_chained_multi
    from dpu_olap_tpu.ops.filter_pallas import (
        filter_compact_pallas,
        filter_with_indices_pallas,
    )
    from dpu_olap_tpu.ops.filter_pallas2 import filter_compact_pallas2
    from dpu_olap_tpu.ops.filter_pallas3 import (
        filter_compact_pallas3,
        filter_with_indices_pallas3,
    )

    for n, tag, k in ((8 << 20, "8Mi", 32), (64 << 20, "64Mi", 4)):
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32)
        )
        jax.block_until_ready(x)

        def cstep(f, r):
            def step(c):
                out, cnt = f(c, block_rows=r)
                return c ^ (out & jnp.uint32(1)) ^ cnt.astype(jnp.uint32)
            return step

        def wstep(f, r):
            def step(c):
                out, sel, cnt = f(c, block_rows=r)
                return (
                    c ^ (out & jnp.uint32(1)) ^ (sel & jnp.uint32(2))
                    ^ cnt.astype(jnp.uint32)
                )
            return step

        specs = [
            (f"v1_r512_{tag}", cstep(filter_compact_pallas, 512), x, k),
            (f"v3_r256_{tag}", cstep(filter_compact_pallas3, 256), x, k),
            (f"v3_r512_{tag}", cstep(filter_compact_pallas3, 512), x, k),
            (f"v2_r256_{tag}", cstep(filter_compact_pallas2, 256), x, k),
            (f"v1wi_r256_{tag}", wstep(filter_with_indices_pallas, 256), x, k),
            (f"v3wi_r256_{tag}", wstep(filter_with_indices_pallas3, 256), x, k),
        ]
        res = time_chained_multi(specs)
        for name, sec in res.items():
            record("v3", name, sec * 1e3,
                   f"{n*4/sec/1e9:.0f} GB/s", nbytes=n * 4)
        del x


def measure_v4():
    """Round-5 A/B: v4 (MXU-routed row phase, ops/filter_pallas4.py) vs the
    committed v1/v3 defaults — INTERLEAVED in one process via
    time_chained_multi. Parity vs numpy on-device first (interpret mode does
    not catch Mosaic lowering semantics)."""
    from dpu_olap_tpu.bench.device_time import time_chained_multi
    from dpu_olap_tpu.ops.filter_pallas import (
        filter_compact_pallas,
        filter_with_indices_pallas,
    )
    from dpu_olap_tpu.ops.filter_pallas3 import filter_compact_pallas3
    from dpu_olap_tpu.ops.filter_pallas4 import (
        filter_compact_pallas4,
        filter_with_indices_pallas4,
    )

    # on-device parity at 2Mi
    n0 = 2 << 20
    xs = np.random.default_rng(7).integers(0, 2**32, n0, dtype=np.uint32)
    thr = 1 << 30
    ref = xs[xs < thr]
    refi = np.nonzero(xs < thr)[0].astype(np.uint32)
    out, cnt = filter_compact_pallas4(jnp.asarray(xs), threshold=thr)
    cnt = int(cnt)
    assert cnt == len(ref) and np.array_equal(np.asarray(out)[:cnt], ref), \
        "v4 compact device parity FAILED"
    ov, oi, c2 = filter_with_indices_pallas4(jnp.asarray(xs), threshold=thr)
    assert int(c2) == len(ref) and np.array_equal(
        np.asarray(oi)[: int(c2)], refi
    ), "v4 with_indices device parity FAILED"
    print("[v4] device parity ok", flush=True)

    for n, tag, k in ((8 << 20, "8Mi", 32), (64 << 20, "64Mi", 4)):
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32)
        )
        jax.block_until_ready(x)

        def cstep(f, **kw):
            def step(c):
                out, cnt = f(c, **kw)
                return c ^ (out & jnp.uint32(1)) ^ cnt.astype(jnp.uint32)
            return step

        def wstep(f, **kw):
            def step(c):
                out, sel, cnt = f(c, **kw)
                return (
                    c ^ (out & jnp.uint32(1)) ^ (sel & jnp.uint32(2))
                    ^ cnt.astype(jnp.uint32)
                )
            return step

        specs = [
            (f"v4h4_{tag}", cstep(filter_compact_pallas4, halves=4), x, k),
            (f"v4h2_{tag}", cstep(filter_compact_pallas4, halves=2), x, k),
            (f"v3_r256_{tag}", cstep(filter_compact_pallas3, block_rows=256),
             x, k),
            (f"v1_r512_{tag}", cstep(filter_compact_pallas, block_rows=512),
             x, k),
            (f"v4wih4_{tag}", wstep(filter_with_indices_pallas4, halves=4),
             x, k),
            (f"v1wi_r256_{tag}",
             wstep(filter_with_indices_pallas, block_rows=256), x, k),
        ]
        res = time_chained_multi(specs)
        for name, sec in res.items():
            record("v4", name, sec * 1e3,
                   f"{n*4/sec/1e9:.0f} GB/s", nbytes=n * 4)
        del x


def measure_defaultab():
    """Compact-default A/B: v1 r512 vs v3 r256, interleaved in ONE process
    at 8Mi and 64Mi. Run in >=3 fresh processes (scripts/run_defaultab.sh
    pattern: for i in 1 2 3; do python scripts/measure_filter.py defaultab;
    done) — the round-5 v4 campaign showed the 8Mi ordering flips across
    processes while 64Mi consistently favored v1. Appends numbered keys."""
    from dpu_olap_tpu.bench.device_time import time_chained_multi
    from dpu_olap_tpu.ops.filter_pallas import filter_compact_pallas
    from dpu_olap_tpu.ops.filter_pallas3 import filter_compact_pallas3

    run_id = len(
        [k for k in results.get("defaultab", {}) if k.startswith("v1_8Mi")]
    )
    for n, tag, k in ((8 << 20, "8Mi", 32), (64 << 20, "64Mi", 8)):
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32)
        )
        jax.block_until_ready(x)

        def cstep(f, r):
            def step(c):
                out, cnt = f(c, block_rows=r)
                return c ^ (out & jnp.uint32(1)) ^ cnt.astype(jnp.uint32)
            return step

        res = time_chained_multi([
            (f"v1_{tag}#{run_id}", cstep(filter_compact_pallas, 512), x, k),
            (f"v3_{tag}#{run_id}", cstep(filter_compact_pallas3, 256), x, k),
            (f"v1b_{tag}#{run_id}", cstep(filter_compact_pallas, 512), x, k),
            (f"v3b_{tag}#{run_id}", cstep(filter_compact_pallas3, 256), x, k),
        ])
        for name, sec in res.items():
            record("defaultab", name, sec * 1e3,
                   f"{n*4/sec/1e9:.0f} GB/s", nbytes=n * 4)
        del x


def _c_op_kernel(op, reps, x_ref, i_ref, out_ref):
    """Stage-C' primitive costs on (128,128) tiles (v4 attribution)."""
    v = x_ref[:]
    idx = i_ref[:]
    for t in range(reps):
        if op == "transpose":
            v = jnp.transpose(v) + t
        elif op == "sq_gather":
            v = jnp.take_along_axis(v, (idx + t) & 127, axis=1)
        elif op == "count_matmul":
            a = ((v & 127) <= ((idx + t) & 127)).astype(jnp.bfloat16)
            b = ((v >> 7) == (idx & 127)).astype(jnp.bfloat16)
            dg = jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            v = v ^ dg.astype(jnp.int32)
        elif op == "cprep":
            # the non-matmul setup: compares + casts + clip + sum
            s0 = jnp.sum(((v >> 7) < idx).astype(jnp.int32), axis=0,
                         keepdims=True)
            v = jnp.clip(v + s0 + t, 0, (1 << 30))
        else:
            raise ValueError(op)
    out_ref[:] = v


def measure_cops():
    r = 128
    reps = 16
    rng = np.random.default_rng(0)
    nblk = 128  # 128 tiles of (128,128) = 2Mi elements
    n = nblk * r * LANES
    xs = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))
    ids = jnp.asarray(rng.integers(0, LANES, n, dtype=np.int32))
    jax.block_until_ready((xs, ids))
    for op in ("transpose", "sq_gather", "count_matmul", "cprep"):
        f = pl.pallas_call(
            functools.partial(_c_op_kernel, op, reps),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((nblk * r, LANES), jnp.int32),
            out_specs=pl.BlockSpec((r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )

        def step(c, f=f):
            return f(c.reshape(nblk * r, LANES), ids.reshape(nblk * r, LANES)
                     ).reshape(n) ^ jnp.int32(1)

        sec = time_chained(step, xs, k=16)
        per_pass = sec / reps
        record(
            "cops", f"{op}_r128x{reps}", sec * 1e3,
            f"{n*4/per_pass/1e9:.0f} GB/s per pass "
            f"({per_pass*1e6:.2f} us/pass/2Mi)",
            nbytes=n * 4,
        )


# ---- stage-ablated variants on the real kernel's skeleton -----------------

def _variant_kernel(stage, threshold, x_ref, out_ref, cnt_ref, work_v,
                    work_d, off_ref, sem):
    from dpu_olap_tpu.ops.filter_pallas import (
        SKEW, _inclusive_scan_rowmajor, _lane_iota, _row_iota, run_butterfly,
        _shift_down,
    )

    i = pl.program_id(0)
    r = x_ref.shape[0]
    wrows = r + SKEW

    @pl.when(i == 0)
    def _():
        off_ref[0] = 0

    offset = off_ref[0]
    blk = x_ref[:]

    if stage == "copy":
        work_v[pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.uint32)
        work_v[pl.ds(SKEW, r)] = blk
        cnt = jnp.sum((blk & jnp.uint32(1)).astype(jnp.int32))
    else:
        mask = (blk < jnp.uint32(threshold)).astype(jnp.int32)
        cnt = jnp.sum(mask)
        if stage == "count":
            work_v[pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.uint32)
            work_v[pl.ds(SKEW, r)] = blk
        else:
            phase = jax.lax.rem(offset, LANES)
            prefix = _inclusive_scan_rowmajor(mask)
            flat = _row_iota((r, LANES)) * LANES + _lane_iota((r, LANES))
            d_blk = jnp.where(
                mask == 1, flat + SKEW * LANES - (prefix - 1 + phase), 0
            )
            work_v[pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.uint32)
            work_v[pl.ds(SKEW, r)] = blk
            work_d[pl.ds(0, SKEW)] = jnp.zeros((SKEW, LANES), jnp.int32)
            work_d[pl.ds(SKEW, r)] = d_blk
            if stage == "prefix":
                pass
            elif stage == "lane_levels":
                total = wrows * LANES
                s = 1
                while s < LANES:
                    d = work_d[:]
                    cd = _shift_down(d, s, wrows)
                    take = (cd & s) != 0
                    v = work_v[:]
                    work_v[:] = jnp.where(take, _shift_down(v, s, wrows), v)
                    work_d[:] = jnp.where(
                        take, cd - s, jnp.where((d & s) == 0, d, 0)
                    )
                    s *= 2
            elif stage == "row_levels":
                s = LANES
                total = wrows * LANES
                while s < total:
                    d = work_d[:]
                    cd = _shift_down(d, s, wrows)
                    take = (cd & s) != 0
                    v = work_v[:]
                    work_v[:] = jnp.where(take, _shift_down(v, s, wrows), v)
                    if s * 2 < total:
                        work_d[:] = jnp.where(
                            take, cd - s, jnp.where((d & s) == 0, d, 0)
                        )
                    s *= 2
            elif stage == "full":
                run_butterfly([work_v], work_d, wrows)

    row0 = jax.lax.div(offset, LANES)
    write = pltpu.make_async_copy(work_v, out_ref.at[pl.ds(row0, wrows)], sem)
    write.start()
    write.wait()
    off_ref[0] = offset + cnt

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0] = offset + cnt


@functools.partial(jax.jit, static_argnames=("stage", "r"))
def _variant(values, stage: str, r: int = 256):
    from dpu_olap_tpu.ops.filter_pallas import SKEW

    n = values.shape[0]
    nrows = n // LANES
    out, cnt = pl.pallas_call(
        functools.partial(_variant_kernel, stage, 1 << 30),
        grid=(nrows // r,),
        in_specs=[
            pl.BlockSpec((r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
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
            pltpu.VMEM((r + SKEW, LANES), jnp.uint32),
            pltpu.VMEM((r + SKEW, LANES), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(values.reshape(nrows, LANES))
    return out[:nrows].reshape(n), cnt[0]


def measure_parts():
    n = 8 << 20
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32)
    )
    jax.block_until_ready(x)
    for stage in ("copy", "count", "prefix", "lane_levels", "row_levels",
                  "full"):
        for r in (64, 256):
            def step(c, stage=stage, r=r):
                out, cnt = _variant(c, stage, r=r)
                return c ^ (out & jnp.uint32(1)) ^ cnt.astype(jnp.uint32)

            sec = time_chained(step, x, k=32)
            record("parts", f"{stage}_r{r}_8Mi", sec * 1e3,
                   f"{n*4/sec/1e9:.0f} GB/s", nbytes=n * 4)


# ---- in-kernel primitive ops ----------------------------------------------

def _op_kernel(op, reps, x_ref, i_ref, out_ref):
    v = x_ref[:]
    idx = i_ref[:]
    r = v.shape[0]
    for t in range(reps):
        if op == "lane_roll":
            v = pltpu.roll(v, 1 + (t & 3), 1)
        elif op == "row_roll":
            v = pltpu.roll(v, 1 + (t & 3), 0)
        elif op == "where":
            v = jnp.where((idx & (1 << (t & 4))) != 0, v, v + 1)
        elif op == "lane_gather":
            v = jnp.take_along_axis(v, (idx + t) & (LANES - 1), axis=1)
        elif op == "sublane_gather":
            v = jnp.take_along_axis(v, (idx + t) % r, axis=0)
        else:
            raise ValueError(op)
    out_ref[:] = v


def measure_ops():
    r = 256
    reps = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**31, (r, LANES), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, LANES, (r, LANES), dtype=np.int32))
    jax.block_until_ready((x, idx))

    # correctness first: device vs interpret for the gather ops
    for op in ("lane_gather", "lane_roll", "row_roll", "sublane_gather"):
        f_int = pl.pallas_call(
            functools.partial(_op_kernel, op, 2),
            out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.int32),
            interpret=True,
        )
        f_dev = pl.pallas_call(
            functools.partial(_op_kernel, op, 2),
            out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.int32),
        )
        a = np.asarray(f_int(x, idx))
        b = np.asarray(f_dev(x, idx))
        ok = np.array_equal(a, b)
        print(f"[ops] parity {op}: {ok}", flush=True)
        assert ok, op

    nblk = 64  # grid steps per call: 64 blocks of (256,128) = 2Mi elements
    n = nblk * r * LANES
    xs = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))
    ids = jnp.asarray(rng.integers(0, LANES, n, dtype=np.int32))
    jax.block_until_ready((xs, ids))

    for op in ("lane_roll", "row_roll", "where", "lane_gather",
               "sublane_gather"):
        f = pl.pallas_call(
            functools.partial(_op_kernel, op, reps),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((nblk * r, LANES), jnp.int32),
            out_specs=pl.BlockSpec((r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )

        def step(c, f=f):
            return f(c.reshape(nblk * r, LANES), ids.reshape(nblk * r, LANES)
                     ).reshape(n) ^ jnp.int32(1)

        sec = time_chained(step, xs, k=16)
        per_pass = sec / reps
        record(
            "ops", f"{op}_r{r}x{reps}", sec * 1e3,
            f"{n*4/per_pass/1e9:.0f} GB/s per pass "
            f"({per_pass*1e6:.2f} us/pass/2Mi)",
            nbytes=n * 4,
        )




def measure_sort():
    """Sort-stage attribution at the flagship probe-sort shape (2Mi 2-op):
    leaf batched sort vs fused in-block rounds vs cross-block rounds."""
    from dpu_olap_tpu.ops.sort_pallas import (
        BLOCK_ROWS, LEAF, bitonic_cascade_blocks, bitonic_cascade_rounds,
        bitonic_xblock, sort_bitonic,
    )

    n = 2 << 20
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.uint32))
    p = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    jax.block_until_ready((k, p))

    for leaf in (2048, 4096, 8192):
        rows = n // leaf

        @functools.partial(jax.jit, static_argnames=())
        def leaf_only(kk, pp, leaf=leaf, rows=rows):
            rflip = (
                jax.lax.broadcasted_iota(jnp.uint32, (rows, leaf), 0)
                % jnp.uint32(2)
            ) * jnp.uint32(0xFFFFFFFF)
            k2 = kk.reshape(rows, leaf) ^ rflip
            out = jax.lax.sort(
                [k2, pp.reshape(rows, leaf)], dimension=1, num_keys=1
            )
            return (out[0] ^ rflip).reshape(n), out[1].reshape(n)

        def step_leaf(c, f=leaf_only):
            a, b = f(c, p)
            return c ^ (a & jnp.uint32(1)) ^ (b & jnp.uint32(2))

        sec = time_chained(step_leaf, k, k=16)
        record("sort", f"leaf{leaf}_2Mi", sec * 1e3,
               f"{n/sec/1e6:.0f} M/s", nbytes=n * 8)

    block = BLOCK_ROWS * LANES

    @jax.jit
    def upto_inblock(kk, pp):
        rows = n // LEAF
        rflip = (
            jax.lax.broadcasted_iota(jnp.uint32, (rows, LEAF), 0)
            % jnp.uint32(2)
        ) * jnp.uint32(0xFFFFFFFF)
        k2 = kk.reshape(rows, LEAF) ^ rflip
        out = jax.lax.sort(
            [k2, pp.reshape(rows, LEAF)], dimension=1, num_keys=1
        )
        cur = ((out[0] ^ rflip).reshape(n), out[1].reshape(n))
        return bitonic_cascade_rounds(
            cur, seg_from=2 * LEAF, seg_to=min(n, block),
            block_rows=BLOCK_ROWS,
        )

    def step_ib(c):
        a, b = upto_inblock(c, p)
        return c ^ (a & jnp.uint32(1)) ^ (b & jnp.uint32(2))

    sec = time_chained(step_ib, k, k=16)
    record("sort", "leaf_plus_inblock_2Mi", sec * 1e3,
           f"{n/sec/1e6:.0f} M/s", nbytes=n * 8)

    def step_full(c):
        a, b = sort_bitonic((c, p))
        return c ^ (a & jnp.uint32(1)) ^ (b & jnp.uint32(2))

    sec = time_chained(step_full, k, k=16)
    record("sort", "full_2Mi", sec * 1e3, f"{n/sec/1e6:.0f} M/s",
           nbytes=n * 8)

    # 1-op sort (keys only) for the plane-count scaling
    def step_full1(c):
        (a,) = sort_bitonic((c,))
        return c ^ (a & jnp.uint32(1))

    sec = time_chained(step_full1, k, k=16)
    record("sort", "full1op_2Mi", sec * 1e3, f"{n/sec/1e6:.0f} M/s",
           nbytes=n * 4)




def measure_sort2():
    """Full tree-sort leaf sweep at 2Mi 2-op (leaf sort is 52% of the
    round-4 attribution; the XLA batched leaf sort runs 1.9x faster at
    2048 columns than 4096)."""
    from dpu_olap_tpu.ops.sort_pallas import sort_bitonic

    n = 2 << 20
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.uint32))
    p = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    jax.block_until_ready((k, p))
    for leaf in (1024, 2048, 4096):
        for br in (512, 1024):
            def step(c, leaf=leaf, br=br):
                a, b = sort_bitonic((c, p), leaf=leaf, block_rows=br)
                return c ^ (a & jnp.uint32(1)) ^ (b & jnp.uint32(2))

            sec = time_chained(step, k, k=16)
            record("sort2", f"full_leaf{leaf}_br{br}_2Mi", sec * 1e3,
                   f"{n/sec/1e6:.0f} M/s", nbytes=n * 8)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["e2e", "parts", "ops"]
    for s in sections:
        globals()[f"measure_{s}"]()
