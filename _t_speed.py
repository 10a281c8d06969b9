import time, numpy as np, jax, jax.numpy as jnp
from multimodal_brain_pattern_identification_xai_tpu import ops, runtime
from multimodal_brain_pattern_identification_xai_tpu.data import synthetic_raw_eeg, synthetic_raw_spectrogram
B=256
rng = np.random.default_rng(0)
raw_eeg = jnp.asarray(runtime.gather_windows(synthetic_raw_eeg(B, rng), np.arange(B, dtype=np.int64)))
raw_spec = jnp.asarray(synthetic_raw_spectrogram(B, rng))
def timed(name, fn, *a):
    f = jax.jit(fn)
    out = f(*a); _ = float(jnp.sum(out))
    ts=[]
    for _r in range(5):
        t0=time.perf_counter()
        for _ in range(8): out=f(*a)
        _=float(jnp.sum(out)); ts.append((time.perf_counter()-t0)/8)
    print(f"{name:28s} {sorted(ts)[2]*1e3:8.2f} ms", flush=True)
timed("eeg_preprocess HIGH", lambda r: ops.hms_eeg_preprocess(r, assume_finite=True), raw_eeg)
timed("spec_preprocess HIGH", lambda r: ops.hms_spectrogram_preprocess(r), raw_spec)
