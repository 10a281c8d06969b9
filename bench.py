"""Benchmark harness — the north-star metric (BASELINE.json):

    end-to-end EEG windows/sec/chip, preprocess + infer, on 50 s / 20 ch
    raw windows.  Target ≥ 10,000 on TPU v5e.

Pipeline per batch: raw (B, 20, 10000) µV windows → full HMS preprocessing
chain (order-5 bandpass → NaN repair → montage → order-6 denoise bandpass
→ flat rolling mean → ::4 decimate → z-score → channel select → pad) as
Pallas/XLA programs → EEGNetAttentionRegularized inference → log-probs.

Measurement notes: each iteration's input is derived from the previous
iteration's output (multiplicative perturbation), so no two calls are
value-identical — this defeats the runtime's identical-call memoization
that makes naive repeated-input timings read 100× too fast.  Prints ONE
JSON line.  ``--gradcam`` prints the attribution-cost metric instead.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_gradcam() -> None:
    """Secondary metric (BASELINE.json): Grad-CAM attribution cost relative
    to plain inference — target < 2×.  Run with ``python bench.py --gradcam``."""
    import jax
    import jax.numpy as jnp
    from multimodal_brain_pattern_identification_xai_tpu import models, xai

    B = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 1, 37, 3000)), jnp.float32)

    model = models.EEGNetAttentionRegularized()
    v = model.init(jax.random.PRNGKey(0), x[:2])
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}

    infer = jax.jit(lambda xx: model.apply(variables, xx))
    cam = jax.jit(lambda xx: xai.grad_cam(model, variables, xx))
    # multiplicative perturbation: changes every element's bit pattern
    # (an additive epsilon underflows against large-magnitude samples)
    perturb_i = jax.jit(lambda xx, o: xx * (1.0 + jnp.mean(o) * 1e-4))
    perturb_c = jax.jit(lambda xx, o: xx * (1.0 + jnp.mean(o) * 1e-4))

    def loop(fn, pert, xx, iters=10):
        out = fn(xx)
        jax.block_until_ready(pert(xx, out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(xx)
            xx = pert(xx, out)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    t_inf = loop(infer, perturb_i, x)
    t_cam = loop(cam, perturb_c, x)
    print(json.dumps({
        "metric": "gradcam_cost_vs_inference",
        "value": round(t_cam / t_inf, 3),
        "unit": "x",
        "vs_baseline": round(2.0 / (t_cam / t_inf), 3),
        "inference_ms": round(t_inf * 1e3, 2),
        "gradcam_ms": round(t_cam * 1e3, 2),
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from multimodal_brain_pattern_identification_xai_tpu import models, ops
    from multimodal_brain_pattern_identification_xai_tpu.data import (
        synthetic_raw_eeg)

    from multimodal_brain_pattern_identification_xai_tpu import runtime

    B = 256
    rng = np.random.default_rng(0)
    # host path: the native loader repairs NaNs while assembling batches
    # (runtime/hostloader.cpp), so the device pipeline takes the
    # assume_finite fast path (montage → single 11-section cascade —
    # mathematically identical, tested).
    raw_store = synthetic_raw_eeg(B, rng)
    raw = jnp.asarray(runtime.gather_windows(raw_store,
                                             np.arange(B, dtype=np.int64)))

    model = models.EEGNetAttentionRegularized()
    pre = jax.jit(lambda r: ops.hms_eeg_preprocess(r, assume_finite=True))
    x0 = pre(raw[:2])
    variables = model.init(jax.random.PRNGKey(0), x0)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    infer = jax.jit(lambda x: model.apply(variables, x))
    # chain each iteration's input on the previous output: uncacheable by
    # construction, negligible extra work.  Multiplicative so every
    # element's bit pattern changes (additive eps underflows in f32).
    perturb = jax.jit(lambda r, logp: r * (1.0 + jnp.mean(logp) * 1e-4))

    def step(raw):
        return infer(pre(raw))

    # warmup / compile
    out = step(raw)
    jax.block_until_ready(perturb(raw, out))

    iters = 12
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(raw)
        raw = perturb(raw, out)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    wps = B * iters / elapsed

    baseline = 10_000.0  # BASELINE.json target windows/sec/chip on v5e
    print(json.dumps({
        "metric": "eeg_windows_per_sec_per_chip",
        "value": round(wps, 2),
        "unit": "windows/s",
        "vs_baseline": round(wps / baseline, 4),
    }))


if __name__ == "__main__":
    if "--gradcam" in sys.argv:
        bench_gradcam()
    else:
        main()
