"""Stable predicate filter with compaction.

Reference: dpu/shared/kernels/filter.c — a 16-tasklet handshake-chain protocol
that compacts passing elements contiguously while preserving input order and
keeping all MRAM writes 8-byte aligned (filter.c:28-55,100-131). The fixed
benchmark predicate is ``item < (1 << 30)`` (filter.c:25, ~25% selectivity).

TPU-native redesign: no handshakes, no mutexes — compaction is expressed as a
data-parallel primitive over the whole HBM-resident column, and the dynamic
result length is carried as a (padded_values, count) pair to respect XLA's
static shapes (the host slices late, exactly like the reference host reads
``output_buffer_length`` per DPU, host/filter/filter_dpu.cc:50-101).

Two interchangeable algorithms (differentially tested against each other and
against pyarrow):
  * "sort"    — stable argsort of the negated mask: kept elements float to the
                front in original order. One fused XLA sort; robust everywhere.
  * "scatter" — exclusive-scan of the mask gives each kept element its output
                slot; one cumsum + one unique-index scatter (less work than
                sort; preferred on TPU where it lowers to an efficient
                scatter).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FLAGS

# The reference benchmark predicate: item < 2^30 (filter.c:25).
FILTER_THRESHOLD = np.uint32(1 << 30)


def default_predicate(v: jnp.ndarray) -> jnp.ndarray:
    return v < FILTER_THRESHOLD


def filter_count(values: jnp.ndarray, predicate: Callable = default_predicate) -> jnp.ndarray:
    return jnp.sum(predicate(values), dtype=jnp.uint32)


def _compact_sort(values, mask, fill):
    # Stable sort on the 1-bit key "failed?" — kept elements keep their order.
    order = jnp.argsort(jnp.logical_not(mask), stable=True)
    out = jnp.take(values, order)
    count = jnp.sum(mask, dtype=jnp.uint32)
    # Poison the tail so padded lanes can never alias real data.
    n = values.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    return jnp.where(lane < count, out, fill), count


def _compact_scatter(values, mask, fill):
    n = values.shape[0]
    # Exclusive scan of the mask = output slot of each kept element. This is
    # the vectorized equivalent of the reference's handshake-accumulated
    # p_count chain (filter.c:28-55).
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    count = jnp.asarray(pos[-1] + 1, dtype=jnp.uint32)
    slot = jnp.where(mask, pos, n)  # failed rows scatter out of range -> dropped
    out = jnp.full((n,), fill, dtype=values.dtype)
    out = out.at[slot].set(values, mode="drop", unique_indices=True)
    return out, count


def filter_compact(
    values: jnp.ndarray,
    predicate: Callable = default_predicate,
    impl: str | None = None,
    fill: int = 0,
):
    """Stable compaction: returns (padded_values, count).

    padded_values[:count] are the passing elements in original order;
    padded_values[count:] == fill.

    impl: "pallas" (TPU kernel, threshold predicate only — measured ~50x
    faster than XLA's scatter lowering on v5e), "scatter", "sort", or "auto"
    (pallas on TPU for the default predicate, scatter elsewhere).
    """
    assert values.ndim == 1, "filter_compact expects a 1-D column (vmap batches)"
    impl = impl or FLAGS.filter_impl
    if impl == "auto":
        impl = "pallas" if (predicate is default_predicate and _on_tpu()) else "scatter"
    if impl == "pallas":
        if predicate is not default_predicate:
            raise ValueError("pallas filter supports the threshold predicate only")
        if FLAGS.enable_trace:
            # ENABLE_TRACE=1 streams per-block progress via pl.debug_print
            # (the reference's device trace() printf, shared/umq/log.h:13-17)
            # — only the v1 kernel carries the trace hooks
            from .filter_pallas import filter_pallas_padded

            return filter_pallas_padded(values, fill=fill, trace=True)
        # v1 (flattened butterfly, r512) is the compact default: the round-5
        # 6-sample interleaved A/B (MEASURE_FILTER.json defaultab — 3 fresh
        # processes, v1/v3 duplicated within each) puts v1 at or ahead of v3
        # by median at both scales (8Mi 0.548 vs 0.588 ms; 64Mi 5.69 vs
        # 5.97), retracting the single-process "+10% for v3" round-5 capture;
        # v3/v4 stay as tested alternates (DESIGN.md filter section).
        from .filter_pallas import filter_pallas_padded

        return filter_pallas_padded(values, fill=fill)
    return _filter_compact_xla(values, predicate, impl, fill)


# Lowering tests set this so TPU-gated paths trace off-device (jax.export
# with platforms=["tpu"] runs Mosaic lowering on any host, but _on_tpu()
# would otherwise steer composites down their CPU fallbacks at trace time).
_FORCE_DEVICE_KERNELS = False


def force_device_kernels(on: bool) -> None:
    global _FORCE_DEVICE_KERNELS
    _FORCE_DEVICE_KERNELS = on


def _on_tpu() -> bool:
    import jax

    return _FORCE_DEVICE_KERNELS or jax.devices()[0].platform in ("tpu", "axon")


@partial(jax.jit, static_argnames=("predicate", "impl", "fill"))
def _filter_compact_xla(
    values: jnp.ndarray,
    predicate: Callable = default_predicate,
    impl: str = "scatter",
    fill: int = 0,
):
    mask = predicate(values)
    if impl == "scatter":
        return _compact_scatter(values, mask, values.dtype.type(fill))
    if impl == "sort":
        return _compact_sort(values, mask, values.dtype.type(fill))
    raise ValueError(f"unknown filter impl {impl!r}")


def filter_with_indices(
    values: jnp.ndarray,
    predicate: Callable = default_predicate,
    impl: str | None = None,
):
    """Compact values AND their original row indices (a selection vector).

    The selection-vector twin of filter_compact — the reference produces
    selection index vectors in the partition kernel for exactly this purpose
    (partition.c: selection_indices_vector).
    Returns (padded_values, padded_indices, count); padded index lanes are n.

    impl/platform resolve per call in this unjitted wrapper (like
    filter_compact) so FLAGS.filter_impl changes take effect immediately;
    only the impl-specific inner functions are jitted.
    """
    impl = impl or FLAGS.filter_impl
    if impl == "auto":
        impl = "pallas" if (predicate is default_predicate and _on_tpu()) else "scatter"
    if impl == "pallas":
        if predicate is not default_predicate:
            raise ValueError("pallas filter supports the threshold predicate only")
        return _filter_with_indices_pallas_padded(values)
    if impl not in ("scatter", "sort"):
        raise ValueError(f"unknown filter impl {impl!r}")
    return _filter_with_indices_xla(values, predicate, impl)


@jax.jit
def _filter_with_indices_pallas_padded(values: jnp.ndarray):
    from .filter_pallas import DEF_R, LANES, filter_with_indices_pallas

    n = values.shape[0]
    pad = (-n) % (DEF_R * LANES)
    x = values
    if pad:
        x = jnp.concatenate([values, jnp.full((pad,), 0xFFFFFFFF, values.dtype)])
    vals, idxs, count = filter_with_indices_pallas(x)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    return (
        jnp.where(lane < count, vals[:n], 0),
        jnp.where(lane < count, idxs[:n], n),
        count,
    )


@partial(jax.jit, static_argnames=("predicate", "impl"))
def _filter_with_indices_xla(
    values: jnp.ndarray,
    predicate: Callable = default_predicate,
    impl: str = "scatter",
):
    n = values.shape[0]
    mask = predicate(values)
    iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    if impl == "sort":
        order = jnp.argsort(jnp.logical_not(mask), stable=True)
        count = jnp.sum(mask, dtype=jnp.uint32)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
        vals = jnp.where(lane < count, jnp.take(values, order), 0)
        idxs = jnp.where(lane < count, jnp.take(iota, order), n)
        return vals, idxs, count
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    count = jnp.asarray(pos[-1] + 1, dtype=jnp.uint32)
    slot = jnp.where(mask, pos, n)
    vals = jnp.zeros((n,), values.dtype).at[slot].set(values, mode="drop", unique_indices=True)
    idxs = jnp.full((n,), n, jnp.uint32).at[slot].set(iota, mode="drop", unique_indices=True)
    return vals, idxs, count
