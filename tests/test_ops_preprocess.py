"""End-to-end preprocessing parity: fused on-device chains vs a numpy/scipy
replica of the reference pipelines (XAI_Multimodality.py:786-797 /
dataset.py:73-103 / data_utils.py:129-249)."""

import pytest
import numpy as np
import scipy.ndimage
import scipy.signal as sps

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
