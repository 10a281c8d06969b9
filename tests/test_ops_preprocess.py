"""End-to-end preprocessing parity: fused on-device chains vs a numpy/scipy
replica of the reference pipelines (XAI_Multimodality.py:786-797 /
dataset.py:73-103 / data_utils.py:129-249)."""

import pytest
import numpy as np
import scipy.ndimage
import scipy.signal as sps
import jax.numpy as jnp

import multimodal_brain_pattern_identification_xai_tpu.config as C
from multimodal_brain_pattern_identification_xai_tpu import ops


def _ref_hms_eeg(x20):
    """Reference HMS_EEG_Dataset.single_map_func on one (20, 10000) window,
    using SOS filtering for the numerically-honest golden (see
    test_ops_iir.py for the direct-form caveat)."""
    f2i = C.feature_to_index()
    sos1 = sps.butter(5, [0.5 / 100, 20 / 100], btype="band", output="sos")
    data = sps.sosfilt(sos1, x20.astype(np.float64), axis=1)
    # handle_nan
    mean = np.nanmean(data, axis=1, keepdims=True)
    mean[np.isnan(mean)] = 0
    idx = np.where(np.isnan(data))
    data[idx] = np.take(mean, idx[0])
    # differentials
    diff = np.stack([data[f2i[a]] - data[f2i[b]] for a, b in C.MAP_FEATURES])
    data = np.vstack([data, diff])
    # denoise_filter
    sos2 = sps.butter(6, [0.5 / 100, 20 / 100], btype="band", output="sos")
    y = sps.sosfilt(sos2, data, axis=1)
    y = (y + np.roll(y, -1) + np.roll(y, -2) + np.roll(y, -3)) / 4
    y = y[:, 0:-1:4]
    # normalize
    y = (y - y.mean(1, keepdims=True)) / (y.std(1, keepdims=True) + 1e-6)
    # select_and_map_channels
    sel = [f2i[ch] for ch in C.EEG_FEATURES] + list(range(20, 38))
    y = y[sel]
    # pad to 3000
    out = np.zeros((37, 3000))
    out[:, :y.shape[1]] = y[:, :3000]
    return out[None]  # (1, 37, 3000)


def test_hms_eeg_preprocess_parity(rng):
    x = (rng.standard_normal((2, 20, 10_000)) * 40).astype(np.float32)
    x[0, 3, 100:200] = np.nan
    got = np.asarray(ops.hms_eeg_preprocess(x))
    assert got.shape == (2, 1, 37, 3000)
    for i in range(2):
        ref = _ref_hms_eeg(x[i])
        err = np.max(np.abs(got[i] - ref))
        assert err < 5e-3, err  # z-scored units


def _ref_hms_spec(spec):
    data = spec.astype(np.float64).copy()
    mean = np.nanmean(data, axis=1, keepdims=True)
    mean[np.isnan(mean)] = 0
    idx = np.where(np.isnan(data))
    data[idx] = np.take(mean, idx[0])
    data -= data.mean(axis=0)
    b, a = sps.iirnotch(60, 30, 200)
    data = sps.filtfilt(b, a, data, axis=0)
    data = scipy.ndimage.gaussian_filter(data, sigma=1.0)
    data = (data - data.min()) / (data.max() - data.min() + 1e-6)
    return np.tile(data[None], (3, 1, 1))


def test_hms_spectrogram_preprocess_parity(rng):
    spec = (rng.standard_normal((2, 400, 300)) * 5).astype(np.float32)
    spec[1, 10, 20:30] = np.nan
    got = np.asarray(ops.hms_spectrogram_preprocess(spec))
    assert got.shape == (2, 3, 400, 300)
    for i in range(2):
        ref = _ref_hms_spec(spec[i])
        assert np.max(np.abs(got[i] - ref)) < 1e-3


def test_hms_spectrogram_preprocess_bf16_serving_close_to_f32(rng):
    """The bf16 serving tail (post NaN-repair/baseline) stays within bf16
    rounding of the f32 chain — the output is min-maxed to [0, 1], so the
    bound is absolute."""
    import jax.numpy as jnp
    spec = (rng.standard_normal((2, 400, 300)) * 5).astype(np.float32)
    f32 = np.asarray(ops.hms_spectrogram_preprocess(spec))
    bf16 = np.asarray(ops.hms_spectrogram_preprocess(
        spec, serving_dtype=jnp.bfloat16)).astype(np.float32)
    assert bf16.dtype == np.float32
    assert np.max(np.abs(bf16 - f32)) < 2e-2


def test_hms_spectrogram_linear_ops_route_matches_sequential(rng):
    """The default dense-operator route ((M_h @ x) @ M_w for the linear
    baseline→filtfilt→Gaussian section) is numerically the sequential
    chain: the operators are built by pushing identities through
    reference-exact float64 scipy/numpy implementations."""
    spec = (rng.standard_normal((3, 400, 300)) * 5).astype(np.float32)
    spec[0, 5, :7] = np.nan
    fast = np.asarray(ops.hms_spectrogram_preprocess(spec, linear_ops=True))
    seq = np.asarray(ops.hms_spectrogram_preprocess(spec, linear_ops=False))
    assert np.max(np.abs(fast - seq)) < 1e-5        # output lives in [0,1]


def test_eeg_transform_parity(rng):
    x = (rng.standard_normal((3, 10_000, 19)) * 300).astype(np.float32)
    cfg = C.EEGTransformConfig()
    got = np.asarray(ops.eeg_transform(x, cfg))
    assert got.shape == (3, 2000, 19)
    # reference chain (dataset.py:73-103)
    ref = np.clip(x.astype(np.float64), -1024, 1024) / 32.0
    sos = sps.butter(4, 20 / 100, btype="low", output="sos")
    ref = sps.sosfilt(sos, ref, axis=1)
    ref = ref[:, ::5, :]
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-4


def test_eeg_transform_magic8(rng):
    x = (rng.standard_normal((2, 1000, 19)) * 100).astype(np.float32)
    cfg = C.EEGTransformConfig(apply_chris_magic_ch8=True, n_feats=8,
                               downsample=None,
                               apply_butter_lowpass_filter=False)
    got = np.asarray(ops.eeg_transform(x, cfg))
    assert got.shape == (2, 1000, 8)


def test_mirror_eeg_swaps_hemispheres(rng):
    x = rng.standard_normal((20, 10)).astype(np.float32)
    got = np.asarray(ops.preprocess.mirror_eeg(x))
    f2i = C.feature_to_index()
    np.testing.assert_array_equal(got[f2i["Fp1"]], x[f2i["Fp2"]])
    np.testing.assert_array_equal(got[f2i["T3"]], x[f2i["T4"]])
    np.testing.assert_array_equal(got[f2i["Fz"]], x[f2i["Fz"]])


@pytest.mark.slow
def test_assume_finite_fast_path_matches_reference_chain(rng):
    """With finite inputs, montage→single-cascade equals the reference
    order (NaN repair is identity; LTI filters commute with the linear
    montage)."""
    import jax.numpy as jnp
    x = (rng.standard_normal((2, 20, 4000)) * 40).astype(np.float32)
    a = np.asarray(ops.hms_eeg_preprocess(jnp.asarray(x)))
    b = np.asarray(ops.hms_eeg_preprocess(jnp.asarray(x), assume_finite=True))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)  # z-scored units


# ---------------------------------------------------------------------------
# Anti-aliased resize (reference resample_spectrogram, data_utils.py:147-148)
# ---------------------------------------------------------------------------

def _golden_skimage_resize(x, target):
    """Float64 direct reimplementation of skimage.transform.resize(
    target, mode='reflect', anti_aliasing=True, order=1) via the
    scipy.ndimage machinery skimage itself wraps (skimage is not installed
    in this image; the pin is vs these reimplemented semantics): Gaussian
    prefilter sigma=max(0,(factor-1)/2) mode='mirror' (skimage 'reflect' ->
    ndi 'mirror'), then order-1 map_coordinates at half-pixel centers."""
    x = np.asarray(x, np.float64)
    factors = [n_in / n_out for n_in, n_out in zip(x.shape, target)]
    sigma = [max(0.0, (f - 1.0) / 2.0) for f in factors]
    if any(s > 0 for s in sigma):
        x = scipy.ndimage.gaussian_filter(x, sigma, mode="mirror")
    grids = [(np.arange(n) + 0.5) * f - 0.5
             for n, f in zip(target, factors)]
    coords = np.meshgrid(*grids, indexing="ij")
    return scipy.ndimage.map_coordinates(x, coords, order=1, mode="mirror")


@pytest.mark.parametrize("shape,target", [
    ((400, 300), (100, 75)),     # pure downscale (anti-alias active)
    ((50, 40), (80, 64)),        # pure upscale (no prefilter)
    ((100, 80), (50, 160)),      # mixed down/up
    ((7, 300), (13, 300)),       # odd sizes, one axis identity
])
def test_resize_antialiased_matches_skimage_semantics(rng, shape, target):
    from multimodal_brain_pattern_identification_xai_tpu.ops import resample
    x = rng.standard_normal(shape).astype(np.float32) * 10
    got = np.asarray(resample.resize_antialiased(jnp.asarray(x), target))
    want = _golden_skimage_resize(x, target)
    assert got.shape == tuple(target)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_resize_antialiased_same_shape_is_identity(rng):
    from multimodal_brain_pattern_identification_xai_tpu.ops import resample
    x = jnp.asarray(rng.standard_normal((32, 24)), jnp.float32)
    assert resample.resize_antialiased(x, (32, 24)) is x


def test_resize_antialiased_batched(rng):
    from multimodal_brain_pattern_identification_xai_tpu.ops import resample
    x = rng.standard_normal((2, 3, 60, 50)).astype(np.float32)
    got = np.asarray(resample.resize_antialiased(jnp.asarray(x), (30, 25)))
    assert got.shape == (2, 3, 30, 25)
    for b in range(2):
        for c in range(3):
            np.testing.assert_allclose(
                got[b, c], _golden_skimage_resize(x[b, c], (30, 25)),
                rtol=2e-5, atol=2e-5)


def test_spectrogram_chain_resample_mode_end_to_end(rng):
    """Non-default image_size with resize_mode='resample': the raw plane is
    smoothly resized instead of zero-padded/cropped; chain completes with
    the right shape and [0,1] min-max range."""
    spec = rng.standard_normal((2, 400, 300)).astype(np.float32) * 5
    sig = C.SignalConfig(image_size=(128, 96), resize_mode="resample")
    out = np.asarray(ops.hms_spectrogram_preprocess(jnp.asarray(spec),
                                                    signal=sig))
    assert out.shape == (2, 3, 128, 96)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
    # and differs from pad/crop semantics on the same target
    sig_pad = C.SignalConfig(image_size=(128, 96), resize_mode="pad")
    out_pad = np.asarray(ops.hms_spectrogram_preprocess(jnp.asarray(spec),
                                                        signal=sig_pad))
    assert not np.allclose(out, out_pad)


def test_spectrogram_chain_resample_mode_repairs_nans_first(rng):
    """NaN repair runs BEFORE the resample-mode resize: a NaN pixel (and a
    whole-NaN row, common at recording boundaries) must stay local — not
    smear through the dense resize matmuls' support bands into NaN output
    rows."""
    spec = rng.standard_normal((2, 400, 300)).astype(np.float32) * 5
    spec[0, 37, 121] = np.nan                   # lone pixel
    spec[1, 200, :] = np.nan                    # full row
    sig = C.SignalConfig(image_size=(128, 96), resize_mode="resample")
    out = np.asarray(ops.hms_spectrogram_preprocess(jnp.asarray(spec),
                                                    signal=sig))
    assert np.isfinite(out).all()
    # repair-then-resize == resizing the pre-repaired plane
    from multimodal_brain_pattern_identification_xai_tpu.ops import nanfix
    fixed = np.asarray(nanfix.nan_to_channel_mean(jnp.asarray(spec),
                                                  axis=-1))
    want = np.asarray(ops.hms_spectrogram_preprocess(jnp.asarray(fixed),
                                                     signal=sig))
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_spectrogram_chain_rejects_bad_resize_mode(rng):
    spec = jnp.asarray(rng.standard_normal((1, 40, 30)), jnp.float32)
    with pytest.raises(ValueError, match="resize_mode"):
        ops.hms_spectrogram_preprocess(
            spec, signal=C.SignalConfig(image_size=(40, 30),
                                        resize_mode="bogus"))


def test_hms_eeg_preprocess_bf16_serving_close_to_f32(rng):
    """serving_dtype=bfloat16 on the assume_finite path: the cascade's
    data matmul reads bf16 (halving the dominant HBM read) while states,
    accumulation and the z-score stay f32 — output deviation vs the f32
    chain must stay at the bf16-input-quantization level on z-scored
    (O(1)) outputs."""
    x = (rng.standard_normal((3, 20, 2000)) * 40).astype(np.float32)
    sig = C.SignalConfig(fixed_length=500)
    f32 = np.asarray(ops.hms_eeg_preprocess(jnp.asarray(x),
                                            assume_finite=True, signal=sig))
    bf16 = np.asarray(ops.hms_eeg_preprocess(
        jnp.asarray(x), assume_finite=True, signal=sig,
        serving_dtype=jnp.bfloat16))
    assert bf16.dtype == np.float32               # z-score upcasts
    err = bf16 - f32
    # bf16 input quantization (~2^-8 relative) through the 11-section
    # cascade: the near-unit-circle 0.5 Hz highpass poles amplify the
    # quantization noise — measured worst-case pointwise 0.118 z-units,
    # rms 0.024 (why the mode is opt-in serving only, never training/XAI)
    assert np.abs(err).max() < 0.25, np.abs(err).max()
    assert np.sqrt((err ** 2).mean()) < 0.035
    c = np.corrcoef(bf16.ravel(), f32.ravel())[0, 1]
    assert c > 0.999, c
