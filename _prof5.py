import time, numpy as np, jax, jax.numpy as jnp
from multimodal_brain_pattern_identification_xai_tpu.models.layers import SpectrogramBlock
B = 256
rng = np.random.default_rng(0)
def timed(name, fn, x):
    f = jax.jit(fn)
    out = f(x); _ = float(jnp.sum(out.astype(jnp.float32)))
    ts=[]
    for _r in range(3):
        t0=time.perf_counter()
        for _ in range(6): out = f(x)
        _ = float(jnp.sum(out.astype(jnp.float32))); ts.append((time.perf_counter()-t0)/6)
    print(f"{name:34s} {sorted(ts)[1]*1e3:8.2f} ms", flush=True)
    return out
shapes = {3:(100,75,32), 4:(50,37,64), 5:(25,18,128)}
widths={3:64,4:128,5:256}; pools={3:"max",4:"avg",5:"max"}
for i in (3,4,5):
    h,w,c = shapes[i]
    x = jnp.asarray(rng.standard_normal((B,h,w,c)), jnp.bfloat16)
    blk = SpectrogramBlock(widths[i], pool_type=pools[i], dtype=jnp.bfloat16)
    v = blk.init(jax.random.PRNGKey(i), x[:2])
    timed(f"block{i} in({h},{w},{c})", lambda xx, blk=blk, v=v: blk.apply(v, xx), x)
