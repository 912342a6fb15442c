import sys; from pathlib import Path; sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_platforms", "cpu")

def k_transpose(x_ref, o_ref):
    o_ref[...] = jnp.swapaxes(x_ref[...], 0, 1)

def k_gather_wide(x_ref, i_ref, o_ref):
    # source (128,128), indices (128, 256) -> output (128,256)
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

def k_dynrow(x_ref, s_ref, o_ref):
    # dynamic-start single-row read from VMEM
    i = s_ref[0]
    o_ref[...] = x_ref[pl.ds(i, 1)]

def try_lower(name, fn, *shapes, smem_idx=None):
    in_specs = []
    for j, s in enumerate(shapes[:-1]):
        if smem_idx is not None and j == smem_idx:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    f = pl.pallas_call(
        fn,
        in_specs=in_specs,
        out_shape=jax.ShapeDtypeStruct(shapes[-1][0], shapes[-1][1]),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    args = [jax.ShapeDtypeStruct(s[0], s[1]) for s in shapes[:-1]]
    try:
        jax.export.export(jax.jit(f), platforms=["tpu"])(*args)
        print(f"{name}: OK")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {msg}")

try_lower("transpose_512x128_u32", k_transpose, ((512,128), jnp.uint32), ((128,512), jnp.uint32))
try_lower("transpose_128x128_i32", k_transpose, ((128,128), jnp.int32), ((128,128), jnp.int32))
try_lower("gather_wide_idx", k_gather_wide, ((128,128), jnp.uint32), ((128,256), jnp.int32), ((128,256), jnp.uint32))
try_lower("dynrow_read", k_dynrow, ((512,128), jnp.uint32), ((1,), jnp.int32), ((1,128), jnp.uint32), smem_idx=1)
