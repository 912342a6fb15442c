"""Take (gather): output[i] = data[indices[i]].

Reference: dpu/shared/kernels/take.c — streams index blocks through WRAM and
issues 4-byte random MRAM loads per index (take.c:27-41).

TPU-native: a single XLA gather over the HBM-resident column. XLA's gather
emitter already pipelines HBM reads; there is no alignment fix-up to do
because gathers are element-typed. Out-of-range behavior is 'fill' (debug
poison) rather than UB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("fill",))
def take(data: jnp.ndarray, indices: jnp.ndarray, fill: int | None = None) -> jnp.ndarray:
    """Gather rows of ``data`` at ``indices`` (uint32)."""
    if fill is None:
        return jnp.take(data, indices.astype(jnp.int32), axis=0, mode="clip")
    return jnp.take(
        data, indices.astype(jnp.int32), axis=0, mode="fill", fill_value=fill
    )


@jax.jit
def take_masked(data: jnp.ndarray, indices: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Gather with a validity mask: invalid lanes produce 0. Used by padded
    shuffle fragments where tail lanes carry sentinel indices."""
    clipped = jnp.where(valid, indices, 0).astype(jnp.int32)
    out = jnp.take(data, clipped, axis=0, mode="clip")
    return jnp.where(valid, out, 0)
