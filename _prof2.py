import time, numpy as np, jax, jax.numpy as jnp, functools
from multimodal_brain_pattern_identification_xai_tpu import models, ops
from multimodal_brain_pattern_identification_xai_tpu.ops import iir, nanfix, normalize, resample, smooth
from multimodal_brain_pattern_identification_xai_tpu.data import synthetic_raw_spectrogram
import multimodal_brain_pattern_identification_xai_tpu.config as C

B = 256
rng = np.random.default_rng(0)
raw = jnp.asarray(synthetic_raw_spectrogram(B, rng))

def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); _ = float(jnp.sum(out))
    ts=[]
    for _r in range(3):
        t0=time.perf_counter()
        for _ in range(6): out = f(*args)
        _ = float(jnp.sum(out)); ts.append((time.perf_counter()-t0)/6)
    print(f"{name:30s} {sorted(ts)[1]*1e3:8.2f} ms")
    return out

cfg = C.HMSPreprocessConfig(); sig = C.SignalConfig()
x0 = timed("pad_or_truncate", lambda r: resample.pad_or_truncate(r, tuple(sig.image_size)), raw)
x1 = timed("nanfix", lambda x: nanfix.nan_to_channel_mean(x, axis=-1), x0)
x2 = timed("baseline", lambda x: normalize.baseline_correction(x, axis=-2), x1)
notch = iir.iirnotch(cfg.notch_freq_hz, cfg.notch_quality, float(sig.sampling_rate))
x3 = timed("notch_filtfilt_blockmm", lambda x: iir.filtfilt(notch, x, axis=-2), x2)
x3s = timed("notch_filtfilt_scan", lambda x: iir.filtfilt(notch, x, axis=-2, engine="xla"), x2)
x4 = timed("gaussian_smooth", lambda x: smooth.gaussian_smooth2d(x, cfg.gaussian_sigma), x3)
def mm(x):
    mn = jnp.min(x, axis=(-2,-1), keepdims=True); mx = jnp.max(x, axis=(-2,-1), keepdims=True)
    return (x-mn)/(mx-mn+1e-6)
x5 = timed("minmax+tile", lambda x: jnp.repeat(mm(x)[..., None, :, :], 3, axis=-3), x4)
