"""Fused, batched preprocessing pipelines.

Each function is one jit-able XLA program over a whole batch — the TPU
replacement for the reference's per-sample ``__getitem__`` scipy chains:

* :func:`eeg_transform`      ← ``_EEGTransformer.transform`` (dataset.py:48-141)
* :func:`hms_eeg_preprocess` ← ``HMS_EEG_Dataset.single_map_func``
  (XAI_Multimodality.py:786-797)
* :func:`hms_spectrogram_preprocess` ← ``HMS_Spectrogram_Dataset.__getitem__``
  (XAI_Multimodality.py:705-737)

Note on the first bandpass order: the reference is self-inconsistent — the
YAML config says order 2 (config.yml:513), the notebook dataset's method
default says order 5 (XAI_Multimodality.py:842) and ``denoise_filter`` uses
order 6 (:864).  Both are exposed via :class:`...config.HMSPreprocessConfig`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from . import iir, montage, nanfix, normalize, resample, smooth


def _np_conv1d_symmetric(x: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Axis-0 1-D convolution with 'symmetric' padding — float64 numpy
    twin of ``smooth._conv1d_reflect`` (scipy 'reflect' semantics)."""
    r = len(kernel) // 2
    xp = np.pad(x, ((r, r), (0, 0)), mode="symmetric")
    return sum(kernel[i] * xp[i:i + x.shape[0]] for i in range(len(kernel)))


@functools.lru_cache(maxsize=8)
def _spec_linear_operators(h: int, w: int, notch: iir.FilterCoeffs,
                           sigma: float, truncate: float = 4.0):
    """Dense operators (M_h, M_w) such that

        gauss2d(filtfilt_H(baseline_H(x))) == (M_h @ x) @ M_w

    for every (..., h, w) plane.  The spectrogram chain's middle section is
    linear for a fixed shape (column-mean subtract; filtfilt — scipy's
    odd-extension padding is affine with zero offset; separable Gaussian
    with reflect boundary), so the whole section collapses into two dense
    matmuls built here in float64 on host by pushing identity matrices
    through reference-exact scipy/numpy implementations.  On TPU that
    replaces ~8 HBM round-trips over the (400,300) plane with two
    MXU-shaped GEMMs (the chain is bandwidth-bound: BREAKDOWN
    spec_preprocess ≈ 5.2 ms of the 39.5 ms multimodal pipeline)."""
    from scipy.signal import filtfilt as _sp_filtfilt

    kern = smooth._gaussian_kernel1d(float(sigma), truncate)
    base = np.eye(h) - np.full((h, h), 1.0 / h)      # baseline_correction
    a_ff = _sp_filtfilt(np.asarray(notch.b), np.asarray(notch.a), base,
                        axis=0)                       # scipy-default padlen
    m_h = _np_conv1d_symmetric(a_ff, kern)
    m_w = _np_conv1d_symmetric(np.eye(w), kern).T
    return m_h.astype(np.float32), m_w.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _rolldec_map(block: int) -> np.ndarray:
    """(block/4, block) rolling-mean-4 + ::4 decimation operator
    (denoise_filter tail, XAI_Multimodality.py:865-866): out[u] =
    mean(y[4u : 4u+4])."""
    R = np.zeros((block // 4, block))
    for u in range(block // 4):
        R[u, 4 * u:4 * u + 4] = 0.25
    return R


# ---------------------------------------------------------------------------
# Raw-EEG transformer chain (EEGDataset / DilatedInceptionWaveNet input)
# ---------------------------------------------------------------------------

def eeg_transform(x: jnp.ndarray,
                  cfg: C.EEGTransformConfig = C.EEGTransformConfig(),
                  fs: float = 200.0) -> jnp.ndarray:
    """Batched ``_EEGTransformer.transform`` (dataset.py:73-103).

    ``x``: (..., L, C) raw window with C = 19 scalp channels (or the raw
    channels Chris' magic-8 needs).  Returns (..., L', C') with L' = L/5
    and C' = 8 (magic) or 19.
    """
    if cfg.apply_chris_magic_ch8:
        # raw parquet windows carry 20 columns (incl. EKG), the
        # transformer's classic input 19 scalp channels — both layouts
        # name every magic-8 electrode, so pick by width
        cols = (C.EEG_COLUMNS if x.shape[-1] == len(C.EEG_COLUMNS)
                else C.EEG_FEATURES)
        x = montage.chris_magic_ch8(x, cols)
    if cfg.normalize:
        x = normalize.clip_scale(x, cfg.clip_value, cfg.scale)
    if cfg.apply_butter_lowpass_filter:
        coeffs = iir.butter_lowpass(cfg.lowpass_cutoff_hz, fs, cfg.lowpass_order)
        x = iir.lfilter(coeffs, x, axis=-2)
    if cfg.apply_mu_law_encoding:
        x = normalize.mu_law_encode(x, 1.0)
    if cfg.downsample:
        x = x[..., ::cfg.downsample, :]
    return x


# ---------------------------------------------------------------------------
# HMS 37-channel EEG chain (EEGNet-family / multimodal input)
# ---------------------------------------------------------------------------

def hms_eeg_preprocess(x: jnp.ndarray,
                       cfg: C.HMSPreprocessConfig = C.HMSPreprocessConfig(),
                       signal: C.SignalConfig = C.SignalConfig(),
                       assume_finite: bool = False,
                       serving_dtype=None) -> jnp.ndarray:
    """Batched ``HMS_EEG_Dataset.single_map_func`` (XAI_Multimodality.py:786-797).

    ``x``: (..., 20, 10000) raw parquet rows (EEG_COLUMNS order, µV).
    Returns (..., 1, 37, 3000) float32 model input.

    Chain: bandpass 0.5–20 Hz → NaN repair → +18 bipolar differentials →
    denoise (order-6 bandpass, 4-tap flat rolling mean, ::4 decimate) →
    per-channel z-score → channel select (19+18) → pad to 3000 → add the
    leading singleton "image" channel.

    ``assume_finite=True`` — the serving/benchmark fast path when the host
    loader already repaired NaNs (data.crop_eeg_window /
    runtime.gather_windows): with finite inputs the NaN repair is the
    identity and the channel-independent LTI cascade commutes with the
    (linear) montage, so the chain collapses to ONE 11-section cascade on
    the 20 RAW lanes followed by the montage on the decimated output —
    half the kernel passes, 20/38 of the cascade work, and the 20→37
    channel expansion happens at T/4 length (≈25× less montage traffic
    than montage-first).  Mathematically identical output (tested); the
    per-channel z-score commutes with the channel-select, so both orders
    match the reference's normalize→select.

    ``serving_dtype=jnp.bfloat16`` (assume_finite path only): the cascade's
    big data matmul reads the raw signal in bf16, halving the
    dominant HBM read of this bandwidth-bound program.  Accumulation,
    filter states and the entry-state chain stay f32 inside
    ``iir._cascade_block_matmul``, and the montage + z-score run f32 on
    the decimated output — deviation vs the f32 chain is pinned by a test.
    Training/XAI paths keep f32 (pass None).
    """
    fs = float(signal.sampling_rate)
    bp1 = iir.butter_bandpass(cfg.bandpass.low, cfg.bandpass.high, fs,
                              cfg.first_bandpass_order)
    bp2 = iir.butter_bandpass(cfg.bandpass.low, cfg.bandpass.high, fs,
                              cfg.denoise_bandpass_order)
    if assume_finite:
        casc = iir.cascade(bp1, bp2)
        # The baked rolling-mean operator is exact only when every emitted
        # output window lies inside the real signal, i.e. T % 4 == 0
        # (otherwise the reference's circular-roll tail semantics differ);
        # other shapes take the explicit post-pass path below.
        use_matmul = (iir._on_tpu() and cfg.decimate_stride == 4
                      and x.shape[-1] % 4 == 0)
        if serving_dtype is not None:
            # bf16 only feeds the FIR-like block matmul (f32 accumulate);
            # the sequential lfilter fallback has feedback recurrences
            # that are unstable in bf16, so it always runs f32
            use_matmul = (cfg.decimate_stride == 4
                          and x.shape[-1] % 4 == 0)
            if use_matmul:
                x = x.astype(serving_dtype)
        if use_matmul:
            # whole cascade as block-Toeplitz MXU matmuls with the
            # rolling-mean-4 + ::4 decimation baked into the output
            # operators (block-local since 128 % 4 == 0) — one matmul
            # pass instead of a 10k-step sequential kernel
            y = iir._cascade_block_matmul(x, casc.sos, block=128,
                                          out_map=_rolldec_map(128))
        else:
            y = iir.lfilter(casc, x, axis=-1)
            y = resample.rolling_mean4_decimate_flat(y, cfg.decimate_stride)
        # montage + channel-select as ONE (37, 20) matmul on the T/4
        # output (commutes with the cascade — channel-independent LTI)
        y = montage.apply_montage(
            y.astype(jnp.float32),
            montage.montage_matrix(C.MAP_FEATURES,
                                   keep_channels=C.EEG_FEATURES))
        y = normalize.zscore(y, axis=-1, eps=cfg.zscore_eps)
        y = resample.pad_or_truncate(y, signal.fixed_length)
        return y[..., None, :, :]                           # (..., 1, 37, T')
    else:
        x = iir.lfilter(bp1, x, axis=-1)
        x = nanfix.nan_to_channel_mean(x, axis=-1)
        x = montage.bipolar_differential(x)                 # (..., 38, T)
        y = iir.lfilter(bp2, x, axis=-1)
        y = resample.rolling_mean4_decimate_flat(y, cfg.decimate_stride)
    # z-score in f32 even in bf16 serving mode: the mean/variance
    # accumulations over T/4 samples lose too much in bf16, and the
    # decimated tensor is 4× smaller so the upcast costs little
    y = normalize.zscore(y.astype(jnp.float32), axis=-1, eps=cfg.zscore_eps)
    y = montage.select_and_map_channels(y)                  # (..., 37, T/4)
    y = resample.pad_or_truncate(y, signal.fixed_length)
    return y[..., None, :, :]                               # (..., 1, 37, 3000)


def mirror_eeg(x: jnp.ndarray) -> jnp.ndarray:
    """Left/right hemisphere swap augmentation (XAI_Multimodality.py:880-884).
    ``x``: (..., 20, T) in EEG_COLUMNS order."""
    f2i = C.feature_to_index()
    idx1 = [f2i[ch] for ch in C.LL + C.LP]
    idx2 = [f2i[ch] for ch in C.RL + C.RP]
    perm = np.arange(x.shape[-2])
    perm[idx1], perm[idx2] = perm[idx2], perm[idx1].copy()
    return x[..., perm, :]


# ---------------------------------------------------------------------------
# HMS spectrogram chain
# ---------------------------------------------------------------------------

def hms_spectrogram_preprocess(spec: jnp.ndarray,
                               cfg: C.HMSPreprocessConfig = C.HMSPreprocessConfig(),
                               signal: C.SignalConfig = C.SignalConfig(),
                               serving_dtype=None,
                               linear_ops: bool = True,
                               ) -> jnp.ndarray:
    """Batched ``HMS_Spectrogram_Dataset`` chain (XAI_Multimodality.py:705-737).

    ``spec``: (..., 400, 300) — the offset-cropped, transposed Kaggle
    spectrogram (cropping happens host-side in the loader since it is pure
    indexing).  Returns (..., 3, 400, 300) float32.

    Chain: reach ``image_size`` + NaN repair (repair first when
    resampling — see ``resize_mode`` below) → baseline
    correction (column-mean subtract) → 60 Hz notch ``filtfilt`` down the
    time axis → Gaussian σ=1 smooth → min-max → final anti-aliased resize
    (a same-shape identity here, as in the reference, elided) → tile to 3
    channels.

    ``signal.resize_mode`` picks how the plane reaches ``image_size``:
    ``"pad"`` (default) zero-pads/crops exactly like the reference
    (data_utils.py:163-181 — its live chains then feed the pre-padded plane
    to ``resample_spectrogram``, making that final anti-aliased resize a
    same-shape identity, XAI_Multimodality.py:1182-1189); ``"resample"``
    smoothly anti-alias-resizes instead
    (:func:`..ops.resample.resize_antialiased`, skimage semantics) — the
    sensible behavior when configuring a non-native ``image_size``.

    ``serving_dtype=jnp.bfloat16``: serving/benchmark fast path — the chain
    after NaN repair and baseline correction runs in bf16, halving the HBM
    traffic of this bandwidth-bound program.  Meant to feed the bf16
    spectrogram CNN (whose own bf16 deviation is the larger term); the
    training/XAI path stays f32.

    ``linear_ops`` (default): collapse the linear middle section
    (baseline → notch filtfilt → Gaussian) into two precomputed dense
    operators ``(M_h @ x) @ M_w`` (see :func:`_spec_linear_operators`) —
    float64-designed, so it is the *more* accurate route as well as the
    fast one; ``False`` keeps the sequential op-by-op chain (the two are
    pinned against each other by a test).
    """
    if signal.resize_mode == "resample":
        # NaN repair must precede the dense resize matmuls: one NaN pixel
        # would otherwise smear across the operators' whole
        # Gaussian+bilinear support band (and an all-NaN row would wipe
        # several output rows) before the repair could see it
        x = nanfix.nan_to_channel_mean(spec, axis=-1)
        x = resample.resize_antialiased(x, tuple(signal.image_size))
    elif signal.resize_mode == "pad":
        x = resample.pad_or_truncate(spec, tuple(signal.image_size))
        x = nanfix.nan_to_channel_mean(x, axis=-1)
    else:
        raise ValueError(
            f"signal.resize_mode must be 'pad' or 'resample', "
            f"got {signal.resize_mode!r}")
    notch = iir.iirnotch(cfg.notch_freq_hz, cfg.notch_quality,
                         float(signal.sampling_rate))
    if linear_ops:
        m_h, m_w = _spec_linear_operators(*x.shape[-2:], notch,
                                          cfg.gaussian_sigma)
        if serving_dtype is not None:
            x = x.astype(serving_dtype)
        dt = x.dtype
        x = jnp.matmul(jnp.asarray(m_h, dt), x,
                       preferred_element_type=jnp.float32).astype(dt)
        x = jnp.matmul(x, jnp.asarray(m_w, dt),
                       preferred_element_type=jnp.float32).astype(dt)
    else:
        x = normalize.baseline_correction(x, axis=-2)
        if serving_dtype is not None:
            x = x.astype(serving_dtype)
        x = iir.filtfilt(notch, x, axis=-2)
        x = smooth.gaussian_smooth2d(x, cfg.gaussian_sigma)
    # per-sample min-max over the full (H, W) plane
    mn = jnp.min(x, axis=(-2, -1), keepdims=True)
    mx = jnp.max(x, axis=(-2, -1), keepdims=True)
    x = (x - mn) / (mx - mn + 1e-6)
    return jnp.repeat(x[..., None, :, :], 3, axis=-3)       # (..., 3, H, W)


def preprocess_multimodal(raw_eeg: jnp.ndarray, raw_spec: jnp.ndarray,
                          cfg: C.HMSPreprocessConfig = C.HMSPreprocessConfig(),
                          signal: C.SignalConfig = C.SignalConfig(),
                          assume_finite: bool = False):
    """Both branches of the CombinedDataset (XAI_Multimodality.py:1114-1307)
    as a single fused program.

    ``assume_finite`` applies to the EEG branch only (see
    :func:`hms_eeg_preprocess`) — real-data windows are NaN-repaired at
    cache-build time, so the training CLI passes True there and takes the
    montage-first single-cascade fast path (the configuration
    ``bench.py --train`` measures).  The spectrogram branch keeps its own
    NaN handling either way (raw Kaggle planes genuinely contain NaNs).
    """
    return (hms_eeg_preprocess(raw_eeg, cfg, signal,
                               assume_finite=assume_finite),
            hms_spectrogram_preprocess(raw_spec, cfg, signal))
