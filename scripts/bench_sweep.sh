#!/usr/bin/env bash
# One-shot benchmark sweep for a live TPU chip: every bench mode plus the
# round-3 levers (DiffEEG bf16 AMP, fused accumulation).  Appends one
# JSON line per run to BENCH_SWEEP.jsonl with the mode/env recorded.
# Usage: bash scripts/bench_sweep.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-BENCH_SWEEP.jsonl}"

run() {  # run <label> <env...> -- <args...>
  local label="$1"; shift
  # resumable: skip modes already recorded in $OUT (delete the line to re-run)
  if [ -f "$OUT" ] && grep -q "\"label\": \"$label\"" "$OUT"; then
    echo "== $label (cached in $OUT, skipping)" >&2
    return
  fi
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "== $label" >&2
  local line
  # the in-bench supervisor gets (nearly) the full per-mode timeout — the
  # 240 s driver default would make it skip scan programs mid-sweep
  line=$(env "${envs[@]}" BENCH_TOTAL_BUDGET="${BENCH_TOTAL_BUDGET:-1140}" \
      timeout 1200 python bench.py "$@" 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    printf '{"label": "%s", "round": %s, "result": %s}\n' \
        "$label" "${BENCH_ROUND:-0}" "$line" >> "$OUT"
  else
    printf '{"label": "%s", "round": %s, "result": {"error": "no output"}}\n' \
        "$label" "${BENCH_ROUND:-0}" >> "$OUT"
  fi
}

run headline           BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 --
run headline_B512      BENCH_BATCH=512 BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 --
run headline_eegbf16   BENCH_EEG_BF16=1 BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 --
run gradcam            BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 -- --gradcam
run latency            BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 -- --latency
run multimodal         BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 -- --multimodal
run multimodal_eegbf16 BENCH_EEG_BF16=1 BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 -- --multimodal
run multimodal_breakdown BENCH_DEVICE_TIMEOUT=120 -- --multimodal --breakdown
# fused phase-packed Pallas spec blocks (r4 lever; first compile ~minutes)
run multimodal_fused2  BENCH_FUSED_SPEC=2 BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 -- --multimodal
run multimodal_fused1  BENCH_FUSED_SPEC=1 BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 -- --multimodal
run multimodal_breakdown_fused2 BENCH_FUSED_SPEC=2 BENCH_DEVICE_TIMEOUT=120 -- --multimodal --breakdown
run multimodal_effnet  BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 -- --multimodal-effnet
run multimodal_effnetv2 BENCH_SCAN=1 BENCH_DEVICE_TIMEOUT=120 -- --multimodal-effnetv2
run convprobe          BENCH_DEVICE_TIMEOUT=120 -- --convprobe
run xai_batch          BENCH_DEVICE_TIMEOUT=120 -- --xai-batch
# r5 opt-in reduced-resolution serving preset (same weights, 200x150 input)
run multimodal_halfres BENCH_SPEC_RES=200x150 BENCH_SCAN=8 BENCH_EEG_BF16=1 BENCH_DEVICE_TIMEOUT=120 -- --multimodal
run train              BENCH_DEVICE_TIMEOUT=120 -- --train
run hostgather         BENCH_DEVICE_TIMEOUT=120 -- --hostgather
run longeeg            BENCH_DEVICE_TIMEOUT=120 -- --longeeg
run diffusion          BENCH_DEVICE_TIMEOUT=120 -- --diffusion
run diffeeg_train      BENCH_DEVICE_TIMEOUT=120 -- --diffeeg-train
run diffeeg_train_bf16 BENCH_DIFF_BF16=1 BENCH_DEVICE_TIMEOUT=120 -- --diffeeg-train
run diffeeg_train_bf16_fuse5 BENCH_DIFF_BF16=1 BENCH_FUSE=5 BENCH_DEVICE_TIMEOUT=120 -- --diffeeg-train
run diffeeg_train_fuse5 BENCH_FUSE=5 BENCH_DEVICE_TIMEOUT=120 -- --diffeeg-train
# late-r4: BENCH_SCAN=8 chained batches per dispatch amortize the tunnel's
# serialized per-execute floor (the pre-scan labels above ran at K=1)
run headline_scan8     BENCH_SCAN=8 BENCH_DEVICE_TIMEOUT=120 --
run headline_eegbf16_scan8 BENCH_EEG_BF16=1 BENCH_SCAN=8 BENCH_DEVICE_TIMEOUT=120 --
run gradcam_scan8      BENCH_SCAN=8 BENCH_DEVICE_TIMEOUT=120 -- --gradcam
run multimodal_scan8   BENCH_SCAN=8 BENCH_DEVICE_TIMEOUT=120 -- --multimodal
# r5 depth sweep found K=8 leaves ~30% of the tunnel dispatch floor
# unamortized (49.2k/59.2k/66.1k/69.9k at K=8/16/32/64 f32); K=64 is the
# new default and the closest estimate of directly-attached throughput
run headline_scan64    BENCH_SCAN=64 BENCH_DEVICE_TIMEOUT=120 --
run headline_eegbf16_scan64 BENCH_EEG_BF16=1 BENCH_SCAN=64 BENCH_DEVICE_TIMEOUT=120 --
run gradcam_scan64     BENCH_SCAN=64 BENCH_DEVICE_TIMEOUT=120 -- --gradcam
run multimodal_scan64  BENCH_SCAN=64 BENCH_DEVICE_TIMEOUT=120 -- --multimodal
run multimodal_halfres_scan64 BENCH_SPEC_RES=200x150 BENCH_SCAN=64 BENCH_EEG_BF16=1 BENCH_DEVICE_TIMEOUT=120 -- --multimodal
# scan-amortized single-window latency: per-window kernel time without
# the tunnel's per-dispatch floor (per_dispatch_ms reported alongside)
run latency_scan64     BENCH_SCAN=64 BENCH_DEVICE_TIMEOUT=120 -- --latency
# K=64 batch-scaling and reference-nsamples points (first captured manually r5)
run headline_B512_scan64 BENCH_BATCH=512 BENCH_SCAN=64 BENCH_DEVICE_TIMEOUT=120 --
run headline_B1024_scan64 BENCH_BATCH=1024 BENCH_SCAN=64 BENCH_DEVICE_TIMEOUT=120 --
run headline_B512_eegbf16_scan64 BENCH_BATCH=512 BENCH_EEG_BF16=1 BENCH_SCAN=64 BENCH_DEVICE_TIMEOUT=120 --
run xai_batch_ns200    BENCH_SHAP_NSAMPLES=200 BENCH_DEVICE_TIMEOUT=120 -- --xai-batch
# asymptote check (K=64 stays the default: +3.3% at double the latency)
run headline_scan128   BENCH_SCAN=128 BENCH_DEVICE_TIMEOUT=120 --
# preset scaling point (experimental, NOT a recommended preset: quarter
# res discards far more detail than the documented 200x150 preset)
run multimodal_quarterres_scan64 BENCH_SPEC_RES=100x75 BENCH_SCAN=64 BENCH_EEG_BF16=1 BENCH_DEVICE_TIMEOUT=120 -- --multimodal

echo "sweep done -> $OUT" >&2
