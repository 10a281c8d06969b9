"""Golden tests for the non-IIR DSP ops vs numpy/scipy reference semantics."""

import numpy as np
import scipy.ndimage
import scipy.signal as sps

import multimodal_brain_pattern_identification_xai_tpu.config as C
from multimodal_brain_pattern_identification_xai_tpu import ops


def test_montage_bipolar_matches_loop(rng):
    x = rng.standard_normal((2, 20, 100)).astype(np.float32)
    f2i = C.feature_to_index()
    got = np.asarray(ops.bipolar_differential(x))
    assert got.shape == (2, 38, 100)
    np.testing.assert_allclose(got[:, :20], x, rtol=1e-6)
    for i, (a, b) in enumerate(C.MAP_FEATURES):
        np.testing.assert_allclose(
            got[:, 20 + i], x[:, f2i[a]] - x[:, f2i[b]], rtol=1e-5, atol=1e-5)


def test_select_and_map_channels():
    x = np.arange(38 * 4, dtype=np.float32).reshape(1, 38, 4)
    got = np.asarray(ops.montage.select_and_map_channels(x))
    assert got.shape == (1, 37, 4)
    # EKG (row 19) is dropped; differential rows 20.. follow row 18.
    np.testing.assert_array_equal(got[0, 18], x[0, 18])
    np.testing.assert_array_equal(got[0, 19], x[0, 20])


def test_chris_magic_ch8(rng):
    x = rng.standard_normal((3, 50, 19)).astype(np.float32)
    got = np.asarray(ops.chris_magic_ch8(x))
    f2i = {ch: i for i, ch in enumerate(C.EEG_FEATURES)}
    ref = np.stack([x[..., f2i[a]] - x[..., f2i[b]]
                    for a, b in C.CHRIS_MAGIC_PAIRS], axis=-1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_nan_to_channel_mean_matches_reference(rng):
    x = rng.standard_normal((5, 200)).astype(np.float32)
    x[0, 10:20] = np.nan
    x[3, :] = np.nan
    got = np.asarray(ops.nan_to_channel_mean(x, axis=-1))
    # reference handle_nan semantics (XAI_Multimodality.py:812-830)
    ref = x.copy()
    mean = np.nanmean(np.where(np.isnan(ref), np.nan, ref), axis=-1, keepdims=True)
    mean[np.isnan(mean)] = 0
    idx = np.where(np.isnan(ref))
    ref[idx] = np.take(mean, idx[0])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.all(got[3] == 0.0)


def test_zscore(rng):
    x = rng.standard_normal((4, 7, 300)).astype(np.float32) * 9 + 3
    got = np.asarray(ops.zscore(x, axis=-1))
    ref = (x - x.mean(-1, keepdims=True)) / (x.std(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_clip_scale_and_mu_law(rng):
    x = (rng.standard_normal((100, 3)) * 2000).astype(np.float32)
    x[0, 0] = np.nan
    got = np.asarray(ops.clip_scale(x))
    ref = np.nan_to_num(np.clip(x, -1024, 1024), nan=0.0) / 32.0
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    m = np.asarray(ops.mu_law_encode(ref, 1.0))
    ref_m = np.sign(ref) * np.log(1 + np.abs(ref)) / np.log(2.0)
    np.testing.assert_allclose(m, ref_m, rtol=1e-4, atol=1e-5)


def test_rolling_mean4_flat_matches_np_roll(rng):
    y = rng.standard_normal((38, 100)).astype(np.float32)
    got = np.asarray(ops.rolling_mean4_flat(y))
    ref = (y + np.roll(y, -1) + np.roll(y, -2) + np.roll(y, -3)) / 4
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_decimate_drop_last():
    x = np.arange(101, dtype=np.float32)[None]
    got = np.asarray(ops.decimate(x, 4, drop_last=True))
    np.testing.assert_array_equal(got[0], x[0, 0:-1:4])


def test_pad_or_truncate():
    x = np.ones((3, 2500), np.float32)
    got = np.asarray(ops.pad_or_truncate(x, 3000))
    assert got.shape == (3, 3000) and got[0, -1] == 0.0
    got2 = np.asarray(ops.pad_or_truncate(np.ones((350, 320), np.float32), (400, 300)))
    assert got2.shape == (400, 300)
    assert got2[399, 0] == 0.0 and got2[0, 299] == 1.0


def test_stft_matches_scipy(rng):
    x = rng.standard_normal((2, 3, 2000)).astype(np.float32)
    f, t, Z = ops.stft(x, fs=200.0, nperseg=64, noverlap=32)
    fr, tr, Zr = sps.stft(x.astype(np.float64), fs=200, nperseg=64,
                          noverlap=32, window="hann")
    np.testing.assert_allclose(f, fr)
    np.testing.assert_allclose(t, tr)
    np.testing.assert_allclose(np.asarray(Z), Zr, atol=2e-6)


def test_stft_log1p_interp_matches_reference_loop(rng):
    """Pin the fused conditioner to the reference compute_stft
    (DiffEEG_utils.py:27-76) per-channel loop."""
    x = rng.standard_normal((2, 4, 2000)).astype(np.float32)
    got = np.asarray(ops.stft_log1p_interp(x, out_t=2000))
    B, Ch, T = x.shape
    specs = []
    for bi in range(B):
        ch_specs = []
        for ci in range(Ch):
            fr, tr, Zr = sps.stft(x[bi, ci].astype(np.float64), fs=200,
                                  nperseg=64, noverlap=32, window="hann")
            S = np.log1p(np.abs(Zr))
            ti = np.linspace(0, tr[-1], 2000)
            Si = np.stack([np.interp(ti, tr, S[k]) for k in range(S.shape[0])])
            ch_specs.append(Si)
        specs.append(np.stack(ch_specs))
    ref = np.asarray(specs)
    mn = ref.min(-1, keepdims=True)
    mx = ref.max(-1, keepdims=True)
    ref = (ref - mn) / (mx - mn + 1e-8)
    assert got.shape == ref.shape == (2, 4, 33, 2000)
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_gaussian_smooth_matches_scipy(rng):
    x = rng.standard_normal((2, 64, 48)).astype(np.float32)
    got = np.asarray(ops.gaussian_smooth2d(x, sigma=1.0))
    ref = np.stack([scipy.ndimage.gaussian_filter(x[i].astype(np.float64), 1.0)
                    for i in range(2)])
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_baseline_correction(rng):
    x = rng.standard_normal((400, 300)).astype(np.float32)
    got = np.asarray(ops.baseline_correction(x, axis=0))
    np.testing.assert_allclose(got, x - x.mean(0, keepdims=True),
                               rtol=1e-5, atol=1e-6)


def test_rolling_mean4_decimate_fused_exact(rng):
    x = rng.standard_normal((2, 38, 10000)).astype(np.float32)
    slow = np.asarray(ops.decimate(ops.rolling_mean4_flat(x), 4,
                                   drop_last=True))
    fast = np.asarray(ops.rolling_mean4_decimate_flat(x, 4))
    assert fast.shape == slow.shape == (2, 38, 2500)
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)
    # non-divisible T falls back to the two-step path
    x2 = rng.standard_normal((1, 3, 101)).astype(np.float32)
    slow2 = np.asarray(ops.decimate(ops.rolling_mean4_flat(x2), 4,
                                    drop_last=True))
    fast2 = np.asarray(ops.rolling_mean4_decimate_flat(x2, 4))
    np.testing.assert_allclose(fast2, slow2, rtol=1e-5, atol=1e-6)
