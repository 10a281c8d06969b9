"""Pallas IIR kernel golden tests (interpret mode on CPU; the same kernel
compiles natively on TPU — perf covered by bench.py)."""

import numpy as np
import jax.numpy as jnp
import scipy.signal as sps

import multimodal_brain_pattern_identification_xai_tpu.ops.iir as iir
from multimodal_brain_pattern_identification_xai_tpu.ops.pallas_iir import (
    pallas_lfilter)


def _rel(a, b):
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)


def test_pallas_matches_sosfilt(rng):
    coeffs = iir.butter_bandpass(0.5, 20.0, 200.0, 5)
    x = (rng.standard_normal((3, 4, 700)) * 40).astype(np.float32)
    ref = sps.sosfilt(np.asarray(coeffs.sos), x.astype(np.float64), axis=-1)
    got = np.asarray(pallas_lfilter(coeffs, jnp.asarray(x), interpret=True,
                                    time_block=128, lane_tile=1024))
    assert _rel(got, ref) < 2e-4


def test_pallas_matches_scan_path(rng):
    """Same recurrence as the XLA scan path — tight agreement."""
    coeffs = iir.butter_bandpass(0.5, 20.0, 200.0, 6)
    x = (rng.standard_normal((2, 5, 555)) * 10).astype(np.float32)
    scan = np.asarray(iir.lfilter(coeffs, x, block_size=None))
    pallas = np.asarray(pallas_lfilter(coeffs, jnp.asarray(x),
                                       interpret=True, time_block=128))
    assert _rel(pallas, scan) < 2e-4


def test_pallas_lowpass_axis(rng):
    coeffs = iir.butter_lowpass(20.0, 200.0, 4)
    x = (rng.standard_normal((300, 6)) * 5).astype(np.float32)
    ref = sps.sosfilt(np.asarray(coeffs.sos), x.astype(np.float64), axis=0)
    got = np.asarray(pallas_lfilter(coeffs, jnp.asarray(x), axis=0,
                                    interpret=True, time_block=128))
    assert _rel(got, ref) < 2e-4


def test_pallas_state_continuity_across_time_blocks(rng):
    """Signal longer than one time block: the state carried in scratch
    across grid steps must keep the output identical to a single block."""
    coeffs = iir.iirnotch(60.0, 30.0, 200.0)
    x = (rng.standard_normal((1, 1024)) * 3).astype(np.float32)
    one = np.asarray(pallas_lfilter(coeffs, jnp.asarray(x), interpret=True,
                                    time_block=1024))
    many = np.asarray(pallas_lfilter(coeffs, jnp.asarray(x), interpret=True,
                                     time_block=128))
    np.testing.assert_allclose(many, one, rtol=1e-5, atol=1e-6)


def test_pallas_rolldec_matches_reference(rng):
    """Fused filter+rolling+decimate vs the float64 scipy golden.  (The
    fused and separate f32 paths differ from each other by the same ~5e-5
    relative rounding both carry vs float64 — an order-11 cascade in f32 —
    so the golden is scipy, at the tolerance the plain kernel also needs.)"""
    from multimodal_brain_pattern_identification_xai_tpu.ops.pallas_iir import (
        pallas_lfilter_rolldec)
    coeffs = iir.butter_bandpass(0.5, 20.0, 200.0, 6)
    x = (rng.standard_normal((2, 3, 1024)) * 20).astype(np.float32)
    yref = sps.sosfilt(np.asarray(coeffs.sos), x.astype(np.float64), axis=-1)
    ref = (yref[..., 0::4][..., :256] + yref[..., 1::4][..., :256]
           + yref[..., 2::4][..., :256] + yref[..., 3::4][..., :256]) / 4
    y_fused = pallas_lfilter_rolldec(coeffs, jnp.asarray(x), interpret=True,
                                     time_block=256)
    assert y_fused.shape == (2, 3, 256)
    assert _rel(np.asarray(y_fused), ref) < 2e-4


def test_pallas_filtfilt_matches_scipy(rng):
    from multimodal_brain_pattern_identification_xai_tpu.ops.pallas_iir import (
        pallas_filtfilt)
    coeffs = iir.iirnotch(60.0, 30.0, 200.0)
    x = (rng.standard_normal((4, 400)) * 5).astype(np.float32)
    ref = sps.filtfilt(np.asarray(coeffs.b), np.asarray(coeffs.a),
                       x.astype(np.float64), axis=-1)
    got = np.asarray(pallas_filtfilt(coeffs, jnp.asarray(x), interpret=True,
                                     time_block=128))
    assert _rel(got, ref) < 1e-3
    # axis argument
    ref0 = sps.filtfilt(np.asarray(coeffs.b), np.asarray(coeffs.a),
                        x.T.astype(np.float64), axis=0)
    got0 = np.asarray(pallas_filtfilt(coeffs, jnp.asarray(x.T), axis=0,
                                      interpret=True, time_block=128))
    assert _rel(got0, ref0) < 1e-3
