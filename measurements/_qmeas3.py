import sys; from pathlib import Path; sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from dpu_olap_tpu.bench.device_time import time_chained
from dpu_olap_tpu.ops.filter_pallas import filter_compact_pallas

for n, tag, k in ((8 << 20, "8Mi", 64), (64 << 20, "64Mi", 8)):
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32))
    jax.block_until_ready(x)
    for r in (512, 1024):
        def step(c, r=r):
            out, cnt = filter_compact_pallas(c, block_rows=r)
            return c ^ (out & jnp.uint32(1)) ^ cnt.astype(jnp.uint32)
        sec = time_chained(step, x, k=k)
        print(f"e2e r{r} {tag}: {sec*1e3:.4f} ms  {n*4/sec/1e9:.1f} GB/s", flush=True)
    del x
