import numpy as np, jax, jax.numpy as jnp
from multimodal_brain_pattern_identification_xai_tpu import models, ops, runtime
from multimodal_brain_pattern_identification_xai_tpu.data import synthetic_raw_eeg, synthetic_raw_spectrogram
B=256
rng = np.random.default_rng(0)
re_ = jnp.asarray(runtime.gather_windows(synthetic_raw_eeg(B, rng), np.arange(B, dtype=np.int64)))
rs = jnp.asarray(synthetic_raw_spectrogram(B, rng))
mm = models.MultimodalModel(eeg_model=models.EEGNetAttentionRegularized(),
                            spectrogram_model=models.SpectrogramCNN(dtype=jnp.bfloat16))
prep_s = lambda r: ops.hms_spectrogram_preprocess(r, serving_dtype=jnp.bfloat16)
xe = ops.hms_eeg_preprocess(re_[:2], assume_finite=True); xs = prep_s(rs[:2])
v = mm.init(jax.random.PRNGKey(0), xe, xs)
v = {"params": v["params"], "batch_stats": v["batch_stats"]}
@jax.jit
def step(re, rsp):
    out = mm.apply(v, ops.hms_eeg_preprocess(re, assume_finite=True), prep_s(rsp))
    f = 1.0 + jnp.mean(out) * 1e-4
    return re*f, rsp*f, out
a,b,o = step(re_, rs); _ = float(jnp.sum(o))
import jax.profiler
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        a,b,o = step(a,b)
    _ = float(jnp.sum(o))
print("trace done")
