import time, numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from multimodal_brain_pattern_identification_xai_tpu.models.layers import SpectrogramBlock

B = 256
rng = np.random.default_rng(0)

def timed(name, fn, x):
    f = jax.jit(fn)
    out = f(x); _ = float(jnp.sum(out))
    ts=[]
    for _r in range(3):
        t0=time.perf_counter()
        for _ in range(6): out = f(x)
        _ = float(jnp.sum(out)); ts.append((time.perf_counter()-t0)/6)
    print(f"{name:34s} {sorted(ts)[1]*1e3:8.2f} ms")
    return out

widths=(16,32,64,128,256); pools=("max","avg","max","avg","max")
x = jnp.asarray(rng.standard_normal((B,400,300,3)), jnp.bfloat16)
for i,(w,p) in enumerate(zip(widths,pools)):
    blk = SpectrogramBlock(w, pool_type=p, dtype=jnp.bfloat16)
    v = blk.init(jax.random.PRNGKey(i), x[:2])
    fn = lambda xx, blk=blk, v=v: blk.apply(v, xx)
    x = timed(f"block{i+1} in{x.shape[1:]}", fn, x)
