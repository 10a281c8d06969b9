import time, numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from multimodal_brain_pattern_identification_xai_tpu.models.layers import max_pool

B = 256
rng = np.random.default_rng(0)
bf = jnp.bfloat16
x = jnp.asarray(rng.standard_normal((B,400,300,3)), bf)

def timed(name, fn, *a):
    f = jax.jit(fn)
    out = f(*a); _ = float(jnp.sum(out.astype(jnp.float32)))
    ts=[]
    for _r in range(3):
        t0=time.perf_counter()
        for _ in range(6): out = f(*a)
        _ = float(jnp.sum(out.astype(jnp.float32))); ts.append((time.perf_counter()-t0)/6)
    print(f"{name:30s} {sorted(ts)[1]*1e3:8.2f} ms")
    return out

k1 = jnp.asarray(rng.standard_normal((3,3,3,16))*0.1, bf)
k2 = jnp.asarray(rng.standard_normal((3,3,16,16))*0.1, bf)
kskip = jnp.asarray(rng.standard_normal((1,1,3,16))*0.1, bf)
dn = ("NHWC","HWIO","NHWC")
conv = lambda x,k,s=1: jax.lax.conv_general_dilated(x,k,(s,s),"SAME",dimension_numbers=dn)
y1 = timed("conv1 3->16 @400x300", lambda x: conv(x,k1), x)
y2 = timed("conv2 16->16 @400x300", lambda y: conv(y,k2), y1)
_ = timed("conv2 x2 chained", lambda y: conv(conv(y,k2),k2), y1)
yp = timed("maxpool 2x2", lambda y: max_pool(y,(2,2)), y2)
yr = timed("bilinear resize 400->200 (3ch)", lambda x: jax.image.resize(x,(B,200,150,3),method="bilinear"), x)
_ = timed("skip 1x1 conv 3->16 @200x150", lambda z: conv(z,kskip), yr)
# strided-conv alternative to resize+1x1 (fused, same arithmetic? no—box avg vs bilinear)
_ = timed("avgpool2x2+1x1 (alt skip)", lambda x: conv(nn.avg_pool(x,(2,2),(2,2)),kskip), x)
# conv1 folded to 1 channel
k1f = jnp.sum(k1, axis=2, keepdims=True)
_ = timed("conv1 1->16 folded", lambda x: conv(x[...,:1],k1f), x)
