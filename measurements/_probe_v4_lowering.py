"""Offline Mosaic lowering probes for the v4 filter stage-C' primitives.

Checks (CLAUDE.md offline-lowering idiom, no tunnel needed):
  1. jnp.transpose of a (128,128) u32 block inside a Pallas TPU kernel
  2. take_along_axis(axis=1) with an index plane WIDER than the 128-lane
     value plane (values (128,128), idx (128,256) -> out (128,256))
  3. bf16 one-hot matmul (128,128)@(128,256) with f32 accumulation
Run: python measurements/_probe_v4_lowering.py
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lower(name, fn, *shapes):
    try:
        jax.export.export(jax.jit(fn), platforms=["tpu"])(
            *[jax.ShapeDtypeStruct(s, d) for s, d in shapes]
        )
        print(f"  OK   {name}")
        return True
    except Exception as e:
        msg = str(e).splitlines()
        head = next((l for l in msg if l.strip()), repr(e))[:160]
        print(f"  FAIL {name}: {head}")
        return False


def k_transpose(x_ref, o_ref):
    o_ref[...] = jnp.transpose(x_ref[...])


def k_gather_wide(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)


def k_onehot_mm(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def main():
    def pc(kern, out_shape, *ins):
        return pl.pallas_call(kern, out_shape=out_shape)(*ins)

    _lower(
        "transpose u32 (128,128)",
        lambda x: pc(k_transpose, jax.ShapeDtypeStruct((128, 128), jnp.uint32), x),
        ((128, 128), jnp.uint32),
    )
    _lower(
        "transpose i32 (128,128)",
        lambda x: pc(k_transpose, jax.ShapeDtypeStruct((128, 128), jnp.int32), x),
        ((128, 128), jnp.int32),
    )
    _lower(
        "gather axis=1 idx(128,256) over vals(128,128)",
        lambda x, i: pc(
            k_gather_wide, jax.ShapeDtypeStruct((128, 256), jnp.uint32), x, i
        ),
        ((128, 128), jnp.uint32),
        ((128, 256), jnp.int32),
    )
    _lower(
        "gather axis=1 idx(128,128) over vals(128,128)",
        lambda x, i: pc(
            k_gather_wide, jax.ShapeDtypeStruct((128, 128), jnp.uint32), x, i
        ),
        ((128, 128), jnp.uint32),
        ((128, 128), jnp.int32),
    )
    _lower(
        "bf16 one-hot matmul (128,128)^T@(128,256) f32 acc",
        lambda a, b: pc(
            k_onehot_mm, jax.ShapeDtypeStruct((128, 256), jnp.float32), a, b
        ),
        ((128, 128), jnp.bfloat16),
        ((128, 256), jnp.bfloat16),
    )


if __name__ == "__main__":
    main()
