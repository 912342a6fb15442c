import sys; from pathlib import Path; sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from dpu_olap_tpu.bench.device_time import time_chained
from dpu_olap_tpu.ops.filter_pallas import filter_compact_pallas, filter_with_indices_pallas
from dpu_olap_tpu.ops.filter_pallas2 import filter_compact_pallas2, filter_with_indices_pallas2

for n, tag, k in ((8 << 20, "8Mi", 64), (64 << 20, "64Mi", 8)):
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32))
    jax.block_until_ready(x)
    cands = []
    for r in (128, 256, 512):
        if r <= 256:
            cands.append((f"v2 r{r}", lambda c, r=r: filter_compact_pallas2(c, block_rows=r)[:2]))
            cands.append((f"v2w r{r}", lambda c, r=r: filter_with_indices_pallas2(c, block_rows=r)))
    cands.append(("v1 r512", lambda c: filter_compact_pallas(c, block_rows=512)))
    cands.append(("v1w r256", lambda c: filter_with_indices_pallas(c, block_rows=256)))
    for nm, f in cands:
        def step(c, f=f):
            res = f(c)
            out = res[0]; cnt = res[-1]
            acc = c ^ (out & jnp.uint32(1)) ^ cnt.astype(jnp.uint32)
            if len(res) == 3:
                acc = acc ^ (res[1] & jnp.uint32(1))
            return acc
        sec = time_chained(step, x, k=k)
        print(f"{nm} {tag}: {sec*1e3:.4f} ms  {n*4/sec/1e9:.1f} GB/s", flush=True)
    del x
