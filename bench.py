"""Benchmark harness — the north-star metric (BASELINE.json):

    end-to-end EEG windows/sec/chip, preprocess + infer, on 50 s / 20 ch
    raw windows.  Target ≥ 10,000 on TPU v5e.

One fused jit per batch: raw (B, 20, 10000) µV windows → full HMS
preprocessing chain (bandpass → NaN repair → montage → denoise →
z-score → select → pad) → EEGNetAttentionRegularized inference →
log-probabilities.  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from multimodal_brain_pattern_identification_xai_tpu import models, ops
    from multimodal_brain_pattern_identification_xai_tpu.data import (
        synthetic_raw_eeg)
    from multimodal_brain_pattern_identification_xai_tpu.utils import (
        benchmark_fn)

    B = 256
    rng = np.random.default_rng(0)
    raw = jnp.asarray(synthetic_raw_eeg(B, rng))          # (B, 20, 10000)

    model = models.EEGNetAttentionRegularized()
    x0 = ops.hms_eeg_preprocess(raw[:2])
    variables = model.init(jax.random.PRNGKey(0), x0)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    @jax.jit
    def pipeline(raw_batch):
        x = ops.hms_eeg_preprocess(raw_batch)
        return model.apply(variables, x)

    stats = benchmark_fn(lambda: pipeline(raw), warmup=2, iters=10)
    wps = B / stats["median_s"]

    baseline = 10_000.0  # BASELINE.json target windows/sec/chip on v5e
    print(json.dumps({
        "metric": "eeg_windows_per_sec_per_chip",
        "value": round(wps, 2),
        "unit": "windows/s",
        "vs_baseline": round(wps / baseline, 4),
    }))


if __name__ == "__main__":
    main()
