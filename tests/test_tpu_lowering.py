"""AOT TPU lowering checks for every Pallas kernel and fused join program.

Interpret-mode tests validate SEMANTICS but skip Mosaic lowering entirely, so
a kernel can pass the whole suite and still fail to compile on hardware
(unsupported reductions, gathers, dtypes — jax raises these client-side while
lowering to the tpu custom call). ``jax.export`` with platforms=["tpu"] runs
that exact lowering on any host, no TPU needed — these tests pin every
device-kernel entry point through it.

This is the tier the reference gets from building dpu binaries at test time
(a dpu-upmem-dpurte-clang compile failure fails the suite even off-hardware).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest
from jax import export

LANES = 128


@pytest.fixture(autouse=True)
def _force_device_paths():
    # TPU-gated composites (_on_tpu() branches in take/hashtable/merge_xla)
    # must trace their DEVICE variants here, not the CPU fallbacks — the
    # export below lowers whatever gets traced. The flag is a trace-time
    # module global that is NOT part of any jit cache key, so caches are
    # cleared on entry and exit: otherwise a shape shared with another test
    # file would silently execute the wrong variant (advisor round 3).
    from dpu_olap_tpu.ops.filter import force_device_kernels

    jax.clear_caches()
    force_device_kernels(True)
    yield
    force_device_kernels(False)
    jax.clear_caches()


def lowers(fn, *args, static=()):
    """Assert fn(*args) lowers for the TPU platform; returns module size."""
    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*specs)
    return len(exp.mlir_module())


def u32(n):
    return jnp.zeros((n,), jnp.uint32)


# ---- L2 kernels ------------------------------------------------------------


def test_lower_filter_kernels():
    from dpu_olap_tpu.ops.filter_pallas import (
        filter_compact_pallas,
        filter_pallas_padded,
        filter_with_indices_pallas,
    )

    lowers(lambda v: filter_compact_pallas(v), u32(3 << 15))
    lowers(lambda v: filter_with_indices_pallas(v), u32(3 << 15))
    lowers(lambda v: filter_pallas_padded(v), u32(50_000))


def test_lower_filter_v3_kernels():
    from dpu_olap_tpu.ops.filter_pallas3 import (
        filter_compact_pallas3,
        filter_with_indices_pallas3,
    )

    lowers(lambda v: filter_compact_pallas3(v), u32(3 << 15))
    lowers(lambda v: filter_with_indices_pallas3(v), u32(3 << 15))
    lowers(lambda v: filter_compact_pallas3(v, block_rows=512), u32(1 << 17))


def test_lower_filter_v4_kernels():
    from dpu_olap_tpu.ops.filter_pallas4 import (
        filter_compact_pallas4,
        filter_pallas4_padded,
        filter_with_indices_pallas4,
    )

    lowers(lambda v: filter_compact_pallas4(v), u32(1 << 18))
    lowers(lambda v: filter_compact_pallas4(v, halves=2), u32(3 << 15))
    lowers(lambda v: filter_with_indices_pallas4(v), u32(1 << 18))
    lowers(lambda v: filter_pallas4_padded(v), u32(50_000))


def test_lower_filter_v2_kernels():
    # the documented-negative v2 kernel stays lowering-pinned so its
    # measurements remain reproducible on future toolchains
    from dpu_olap_tpu.ops.filter_pallas2 import (
        filter_compact_pallas2,
        filter_with_indices_pallas2,
    )

    lowers(lambda v: filter_compact_pallas2(v), u32(3 << 15))
    lowers(lambda v: filter_with_indices_pallas2(v), u32(3 << 15))


def test_lower_sort_and_merge():
    from dpu_olap_tpu.ops.merge_xla import bitonic_merge
    from dpu_olap_tpu.ops.sort_pallas import sort_bitonic

    lowers(lambda k, p: sort_bitonic((k, p)), u32(3 << 15), u32(3 << 15))
    # non-pow2 padding wrapper
    lowers(lambda k: sort_bitonic((k,)), u32(50_000))
    lowers(lambda k, p: bitonic_merge((k, p)), u32(1 << 17), u32(1 << 17))


def test_lower_scan_kernels():
    from dpu_olap_tpu.ops.scan_pallas import propagate_fill, propagate_last

    n = 128 << 10  # must be a block multiple (64Ki)
    lowers(
        lambda a, v: propagate_last(a, (v,)),
        jnp.zeros((n,), jnp.bool_),
        u32(n),
    )
    lowers(lambda k, v: propagate_fill((k, v)), u32(n), u32(n))


def test_lower_partition_cells():
    from dpu_olap_tpu.ops.partition_pallas import partition_cells_pallas

    lowers(
        lambda k, p: partition_cells_pallas(k, (p,), 8, 32 << 10),
        u32(64 << 10),
        u32(64 << 10),
    )


def test_lower_sum_pallas():
    from dpu_olap_tpu.ops.aggregate import sum_u64_pair

    lowers(sum_u64_pair, u32(1 << 20))


def test_lower_merge_probe():
    from dpu_olap_tpu.ops.merge_pallas import merge_probe_pallas

    n = 3 << 15  # 96Ki: unique avals, no CPU-variant jit-cache reuse
    lowers(lambda l, r, p: merge_probe_pallas(l, r, (p,)), u32(n), u32(n), u32(n))


def test_lower_take_kernels():
    from dpu_olap_tpu.ops.take_pallas import (
        gather_sorted_pallas,
        take_sorted,
        take_sorted_stream,
    )

    data, idx = u32(1 << 20), u32(128 << 10)
    lowers(lambda d, s: gather_sorted_pallas(d, s), data, idx)
    lowers(lambda d, s: take_sorted(d, s), data, idx)
    # non-power-of-two query count: the explicit pow2 pad branch
    lowers(lambda d, s: take_sorted(d, s), data, u32(100_000))
    # order-free stream variant (no restore sort)
    lowers(lambda d, s: take_sorted_stream(d, s), data, idx)
    lowers(lambda d, s: take_sorted_stream(d, s), data, u32(100_000))


def test_lower_sorted_hashtable():
    from dpu_olap_tpu.ops.hashtable import ht_build_sorted, ht_probe_sorted

    n = 3 << 15  # 96Ki: unique avals, no CPU-variant jit-cache reuse

    def build_probe(k, v, q):
        t = ht_build_sorted(k, v)
        return ht_probe_sorted(t, q)

    lowers(build_probe, u32(n), u32(n), u32(n))
    lowers(build_probe, u32(n), u32(n), u32(50_000))  # non-pow2 queries

    from dpu_olap_tpu.ops.hashtable import ht_probe_sorted_stream

    def build_probe_stream(k, v, q):
        t = ht_build_sorted(k, v)
        return ht_probe_sorted_stream(t, q)

    lowers(build_probe_stream, u32(n), u32(n), u32(n))
    lowers(build_probe_stream, u32(n), u32(n), u32(50_000))


# ---- fused join programs (the flagship paths) -------------------------------


def test_lower_join_fused_and_sorted_build():
    from dpu_olap_tpu.ops.join import join_shard_auto

    n = 3 << 15  # 96Ki: unique avals, no CPU-variant jit-cache reuse
    fk, y, pk, x = u32(n), u32(n), u32(n), u32(n)
    # generic fused co-sort (keys31 packing on and off)
    lowers(
        lambda a, b, c, d: join_shard_auto(a, (b,), c, (d,), keys31=True),
        fk, y, pk, x,
    )
    lowers(
        lambda a, b, c, d: join_shard_auto(a, (b,), c, (d,)), fk, y, pk, x
    )
    # sorted-build bitonic-merge tier
    lowers(
        lambda a, b, c, d: join_shard_auto(
            a, (b,), c, (d,), keys31=True, pk_sorted=True
        ),
        fk, y, pk, x,
    )


def test_lower_join_dense():
    from dpu_olap_tpu.ops.merge_xla import join_shard_dense

    n = 3 << 15  # 96Ki: unique avals, no CPU-variant jit-cache reuse
    lowers(
        lambda a, b, c, d: join_shard_dense(a, (b,), c, (d,)),
        u32(n), u32(n), u32(n), u32(n),
    )


def test_lower_flagship_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowers(fn, *args)


# ---- multi-chip programs (AbstractMesh: no devices needed) -------------------


def test_lower_dist_join_multichip():
    """The sharded multi-round join lowers for an 8-TPU mesh — real-TPU
    SPMD lowering evidence beyond the virtual-CPU-mesh dryrun."""
    from jax.sharding import AbstractMesh, NamedSharding, PartitionSpec as P

    from dpu_olap_tpu.parallel.dist_join import dist_join_spmd
    from dpu_olap_tpu.parallel.mesh import AXIS

    mesh = AbstractMesh((8,), (AXIS,))
    n, cell = 8 * (1 << 13), 2048

    def body(lf, ly, rk, rx):
        return dist_join_spmd(lf, (ly,), rk, (rx,), 8, cell, cell, rounds=2)

    f = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AXIS),) * 4,
            out_specs=(P(AXIS),) * 5,
            check_vma=False,
        )
    )
    s = jax.ShapeDtypeStruct(
        (n,), jnp.uint32, sharding=NamedSharding(mesh, P(AXIS))
    )
    export.export(f, platforms=["tpu"])(s, s, s, s)


def test_lower_dist_join_2d_multichip():
    """The hierarchical (DCN x ICI) multi-round join lowers for a 2x4 TPU
    mesh."""
    from jax.sharding import AbstractMesh, NamedSharding, PartitionSpec as P

    from dpu_olap_tpu.parallel.multihost import (
        DCN_AXIS,
        ICI_AXIS,
        dist_join_2d_spmd,
    )

    mesh = AbstractMesh((2, 4), (DCN_AXIS, ICI_AXIS))
    n, cell = 8 * (1 << 13), 2048

    def body(lf, ly, rk, rx):
        return dist_join_2d_spmd(
            lf, (ly,), rk, (rx,), 2, 4, cell, cell, rounds=2
        )

    spec = P((DCN_AXIS, ICI_AXIS))
    f = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(spec,) * 4,
            out_specs=(spec,) * 5,
            check_vma=False,
        )
    )
    s = jax.ShapeDtypeStruct(
        (n,), jnp.uint32, sharding=NamedSharding(mesh, spec)
    )
    export.export(f, platforms=["tpu"])(s, s, s, s)
