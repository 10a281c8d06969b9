import time, numpy as np, jax, jax.numpy as jnp
B=256; H=400; W=300; C=16
bf = jnp.bfloat16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B,H,W,C)), bf)
k = np.asarray(rng.standard_normal((3,3,C,C))*0.1, np.float32)
dn = ("NHWC","HWIO","NHWC")
conv = lambda x,kk: jax.lax.conv_general_dilated(x,kk,(1,1),"SAME",dimension_numbers=dn)

def timed(name, fn, *a):
    f = jax.jit(fn)
    out = f(*a); _ = float(jnp.sum(out.astype(jnp.float32)))
    ts=[]
    for _r in range(5):
        t0=time.perf_counter()
        for _ in range(8): out=f(*a)
        _=float(jnp.sum(out.astype(jnp.float32))); ts.append((time.perf_counter()-t0)/8)
    print(f"{name:34s} {sorted(ts)[2]*1e3:8.2f} ms", flush=True)
    return out

y0 = timed("baseline conv 16->16", lambda v: conv(v, jnp.asarray(k,bf)), x)

# W-phase packing (factor 2): x' (B,H,W/2,2C)
def pack_kernel_w(k):
    C_in, C_out = k.shape[2], k.shape[3]
    kp = np.zeros((3,3,2*C_in,2*C_out), np.float32)
    for b_ in range(2):
        for dw in (-1,0,1):
            t = b_+dw; a_ = t % 2; pj = (t-a_)//2
            kp[:, pj+1, a_*C_in:(a_+1)*C_in, b_*C_out:(b_+1)*C_out] = k[:, dw+1]
    return kp
kpw = jnp.asarray(pack_kernel_w(k), bf)
def conv_packw(v):
    vp = v.reshape(B,H,W//2,2*C)
    yp = conv(vp, kpw)
    return yp.reshape(B,H,W,C)
y1 = timed("W-packed conv (2x)", conv_packw, x)

# 2x2 packing: x' (B,H/2,W/2,4C); phase order (ph, pw)
def pack_kernel_hw(k):
    C_in, C_out = k.shape[2], k.shape[3]
    kp = np.zeros((3,3,4*C_in,4*C_out), np.float32)
    for ah in range(2):
        for aw in range(2):
            for dh in (-1,0,1):
                for dw in (-1,0,1):
                    th, tw = ah+dh, aw+dw
                    ph_, pw_ = th%2, tw%2
                    qh, qw = (th-ph_)//2, (tw-pw_)//2
                    ci = (ph_*2+pw_)*C_in; co = (ah*2+aw)*C_out
                    kp[qh+1, qw+1, ci:ci+C_in, co:co+C_out] = k[dh+1, dw+1]
    return kp
kph = jnp.asarray(pack_kernel_hw(k), bf)
def conv_packhw(v):
    vp = v.reshape(B,H//2,2,W//2,2,C).transpose(0,1,3,2,4,5).reshape(B,H//2,W//2,4*C)
    yp = conv(vp, kph)
    return yp.reshape(B,H//2,W//2,2,2,C).transpose(0,1,3,2,4,5).reshape(B,H,W,C)
y2 = timed("HW-packed conv (2x2)", conv_packhw, x)

# correctness
e1 = float(jnp.max(jnp.abs(y1.astype(jnp.float32)-y0.astype(jnp.float32))))
e2 = float(jnp.max(jnp.abs(y2.astype(jnp.float32)-y0.astype(jnp.float32))))
print("maxdiff W-pack", e1, " HW-pack", e2)
