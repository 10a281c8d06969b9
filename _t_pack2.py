import time, numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from multimodal_brain_pattern_identification_xai_tpu.models.layers import SpectrogramBlock, max_pool
B=256; bf=jnp.bfloat16
rng = np.random.default_rng(0)

def timed(name, fn, *a):
    f = jax.jit(fn)
    out = f(*a); _ = float(jnp.sum(out.astype(jnp.float32)))
    ts=[]
    for _r in range(5):
        t0=time.perf_counter()
        for _ in range(8): out=f(*a)
        _=float(jnp.sum(out.astype(jnp.float32))); ts.append((time.perf_counter()-t0)/8)
    print(f"{name:36s} {sorted(ts)[2]*1e3:8.2f} ms", flush=True)
    return out

def pack_kernel_w(k):
    kh, kw, C_in, C_out = k.shape
    assert kw == 3
    kp = np.zeros((kh,3,2*C_in,2*C_out), np.float32)
    for b_ in range(2):
        for dw in (-1,0,1):
            t=b_+dw; a_=t%2; pj=(t-a_)//2
            kp[:, pj+1, a_*C_in:(a_+1)*C_in, b_*C_out:(b_+1)*C_out] = k[:, dw+1]
    return kp

dn=("NHWC","HWIO","NHWC")
conv=lambda x,k: jax.lax.conv_general_dilated(x,k,(1,1),"SAME",dimension_numbers=dn)

# baseline block1+block2 (bf16)
x = jnp.asarray(rng.standard_normal((B,400,300,3)), bf)
b1 = SpectrogramBlock(16, pool_type="max", dtype=bf)
v1 = b1.init(jax.random.PRNGKey(1), x[:2])
x2 = b1.apply(v1, x[:2])
b2 = SpectrogramBlock(32, pool_type="avg", dtype=bf)
v2 = b2.init(jax.random.PRNGKey(2), x2)
base = timed("baseline b1+b2", lambda v: b2.apply(v2, b1.apply(v1, v)), x)

# packed prototype: random weights, same shapes of work
ks = {}
cins = {"c11":(3,16),"c12":(16,16),"c13":(16,16),"s1":(3,16),
        "c21":(16,32),"c22":(32,32),"c23":(32,32),"s2":(16,32)}
for n,(ci,co) in cins.items():
    if n.startswith("s"):
        ks[n] = jnp.asarray(rng.standard_normal((1,1,2*ci,2*co))*0.1, bf)  # packed 1x1
    else:
        ks[n] = jnp.asarray(pack_kernel_w(rng.standard_normal((3,3,ci,co))*0.1), bf)

def packed_b1b2(x):
    # pack W: (B,400,150,6)
    xp = x.reshape(B,400,150,6)
    y = nn.relu(conv(xp, ks["c11"]))
    y = nn.relu(conv(y, ks["c12"]))
    y = nn.relu(conv(y, ks["c13"]))
    # maxpool 2x2 in packed: over H pairs spatially + W phases in channels
    y = jnp.maximum(y[..., :16], y[..., 16:])          # W phases
    y = nn.max_pool(y, (2,1), (2,1), "VALID")           # H pairs -> (B,200,150,16)
    # BN eval approx: affine
    y = y*jnp.asarray(1.1,bf)+jnp.asarray(0.05,bf)
    # skip: bilinear half = phase-avg (W) + pair-avg (H), then 1x1 (use unpacked 1x1)
    sk = (xp[..., :3] + xp[..., 3:])*jnp.asarray(0.5,bf)
    sk = nn.avg_pool(sk, (2,1),(2,1),"VALID")
    sk = conv(sk, ks["s1"][:, :, :3, :16])
    y = y + sk
    # ---- block2: repack W: (B,200,150,16) -> treat W=150 pack-> 75? 150 even
    yp = y.reshape(B,200,75,32)
    z = nn.relu(conv(yp, ks["c21"]))
    z = nn.relu(conv(z, ks["c22"]))
    z = nn.relu(conv(z, ks["c23"]))
    z = (z[..., :32] + z[..., 32:])*jnp.asarray(0.5,bf)   # avg W phases
    z = nn.avg_pool(z, (2,1),(2,1),"VALID")               # (B,100,75,32)
    z = z*jnp.asarray(1.1,bf)+jnp.asarray(0.05,bf)
    sk2 = (yp[..., :16]+yp[..., 16:])*jnp.asarray(0.5,bf)
    sk2 = nn.avg_pool(sk2,(2,1),(2,1),"VALID")
    sk2 = conv(sk2, ks["s2"][:, :, :16, :32])
    return z + sk2
_ = timed("packed  b1+b2", packed_b1b2, x)
