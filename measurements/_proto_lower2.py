import sys; from pathlib import Path; sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_platforms", "cpu")

def k_gather_wide(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

f = pl.pallas_call(
    k_gather_wide,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_shape=jax.ShapeDtypeStruct((128,256), jnp.uint32),
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)
try:
    jax.export.export(jax.jit(f), platforms=["tpu"])(
        jax.ShapeDtypeStruct((128,128), jnp.uint32),
        jax.ShapeDtypeStruct((128,256), jnp.int32))
except Exception as e:
    print(str(e)[:2000])
else:
    pass
print("gather_wide: lowered OK")
