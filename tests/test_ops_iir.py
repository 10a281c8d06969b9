"""Golden tests: on-device IIR filters vs scipy (SURVEY.md §4 layer 1)."""

import numpy as np
import pytest
import scipy.signal as sps

import multimodal_brain_pattern_identification_xai_tpu.ops.iir as iir


def _rel_err(a, b):
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)


@pytest.mark.parametrize("design,kw", [
    ("lowpass", dict(cutoff=20.0, fs=200.0, order=4)),
    ("bandpass", dict(low=0.5, high=20.0, fs=200.0, order=2)),
    ("bandpass", dict(low=0.5, high=20.0, fs=200.0, order=5)),
    ("bandpass", dict(low=0.5, high=20.0, fs=200.0, order=6)),
    ("notch", dict(freq=60.0, quality=30.0, fs=200.0)),
])
def test_design_matches_scipy(design, kw):
    if design == "lowpass":
        c = iir.butter_lowpass(**kw)
        b, a = sps.butter(kw["order"], kw["cutoff"] / (0.5 * kw["fs"]), btype="low")
    elif design == "bandpass":
        c = iir.butter_bandpass(**kw)
        nyq = 0.5 * kw["fs"]
        b, a = sps.butter(kw["order"], [kw["low"] / nyq, kw["high"] / nyq], btype="band")
    else:
        c = iir.iirnotch(**kw)
        b, a = sps.iirnotch(kw["freq"], kw["quality"], kw["fs"])
    np.testing.assert_allclose(np.asarray(c.b), b, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c.a), a, rtol=1e-12)


@pytest.mark.parametrize("order,block", [(2, None), (2, 128), (4, None),
                                         (4, 128), (5, 128), (6, None),
                                         (6, 64), (6, 200)])
def test_lfilter_bandpass_matches_scipy(rng, order, block):
    """Golden vs float64 scipy.

    The SOS cascade is the golden reference: at order ≥ 6 scipy's *own*
    float64 direct-form ``lfilter(b, a)`` deviates ~4e-3 from float64
    ``sosfilt`` because the transfer-function representation is itself
    ill-conditioned; the cascade is the numerically correct answer, so we
    pin tightly to ``sosfilt`` and only loosely to ``lfilter``.
    """
    if order == 4:
        coeffs = iir.butter_lowpass(20.0, 200.0, 4)
    else:
        coeffs = iir.butter_bandpass(0.5, 20.0, 200.0, order)
    x = rng.standard_normal((3, 5, 2000)).astype(np.float32) * 50
    ref_sos = sps.sosfilt(np.asarray(coeffs.sos), x.astype(np.float64), axis=-1)
    ref_tf = sps.lfilter(np.asarray(coeffs.b), np.asarray(coeffs.a),
                         x.astype(np.float64), axis=-1)
    got = np.asarray(iir.lfilter(coeffs, x, axis=-1, block_size=block))
    assert _rel_err(got, ref_sos) < 2e-4
    assert _rel_err(got, ref_tf) < 1e-2


def test_lfilter_axis_argument(rng):
    coeffs = iir.butter_lowpass(20.0, 200.0, 4)
    x = rng.standard_normal((500, 7)).astype(np.float32)
    ref = sps.lfilter(np.asarray(coeffs.b), np.asarray(coeffs.a),
                      x.astype(np.float64), axis=0)
    got = np.asarray(iir.lfilter(coeffs, x, axis=0))
    assert _rel_err(got, ref) < 2e-3


def test_block_parallel_equals_sequential(rng):
    coeffs = iir.butter_bandpass(0.5, 20.0, 200.0, 6)
    x = rng.standard_normal((4, 10_000)).astype(np.float32)
    seq = np.asarray(iir.lfilter(coeffs, x, block_size=None))
    blk = np.asarray(iir.lfilter(coeffs, x, block_size=128))
    assert _rel_err(blk, seq) < 1e-4


def test_block_size_not_dividing_length(rng):
    coeffs = iir.butter_bandpass(0.5, 20.0, 200.0, 2)
    x = rng.standard_normal((2, 777)).astype(np.float32)
    seq = np.asarray(iir.lfilter(coeffs, x, block_size=None))
    blk = np.asarray(iir.lfilter(coeffs, x, block_size=128))
    assert _rel_err(blk, seq) < 1e-4


def test_filtfilt_notch_matches_scipy(rng):
    coeffs = iir.iirnotch(60.0, 30.0, 200.0)
    x = (rng.standard_normal((6, 400)) * 10).astype(np.float32)
    ref = sps.filtfilt(np.asarray(coeffs.b), np.asarray(coeffs.a),
                       x.astype(np.float64), axis=-1)
    got = np.asarray(iir.filtfilt(coeffs, x, axis=-1))
    assert _rel_err(got, ref) < 1e-3


def test_filtfilt_axis0(rng):
    coeffs = iir.iirnotch(60.0, 30.0, 200.0)
    x = (rng.standard_normal((400, 6)) * 3).astype(np.float32)
    ref = sps.filtfilt(np.asarray(coeffs.b), np.asarray(coeffs.a),
                       x.astype(np.float64), axis=0)
    got = np.asarray(iir.filtfilt(coeffs, x, axis=0))
    assert _rel_err(got, ref) < 1e-3


def test_filtfilt_blockmm_matches_scipy(rng):
    """The MXU block-Toeplitz filtfilt engine (steady-state zi folded into
    the entry-state chain) pins to scipy like the scan engine does —
    single-section notch and a 5-section bandpass cascade."""
    for coeffs, shape in ((iir.iirnotch(60.0, 30.0, 200.0), (6, 400)),
                          (iir.butter_bandpass(0.5, 20.0, 200.0, 5), (3, 500))):
        x = (rng.standard_normal(shape) * 10).astype(np.float32)
        ref = sps.filtfilt(np.asarray(coeffs.b), np.asarray(coeffs.a),
                           x.astype(np.float64), axis=-1)
        got = np.asarray(iir.filtfilt(coeffs, x, axis=-1, engine="blockmm"))
        assert _rel_err(got, ref) < 1e-3


def test_cascade_block_matmul_initial_state(rng):
    """z0 folding in _cascade_block_matmul equals the sequential scan
    started from the same per-section state."""
    import jax.numpy as jnp
    coeffs = iir.butter_bandpass(0.5, 20.0, 200.0, 3)
    x = rng.standard_normal((4, 300)).astype(np.float32)
    z0 = (rng.standard_normal((4, len(coeffs.sos), 2)) * 0.5).astype(np.float32)
    seq, _ = iir._sos_scan(jnp.asarray(x), coeffs.sos, jnp.asarray(z0))
    blk = iir._cascade_block_matmul(jnp.asarray(x), coeffs.sos, block=64,
                                    z0=jnp.asarray(z0).reshape(4, -1))
    assert _rel_err(np.asarray(blk), np.asarray(seq)) < 5e-4


def test_block_parallel_with_initial_state(rng):
    """Per-lane initial DF2T state in the block-parallel path equals the
    sequential scan with the same zi."""
    import jax.numpy as jnp
    coeffs = iir.iirnotch(60.0, 30.0, 200.0)
    sec = coeffs.sos[0]
    x = rng.standard_normal((5, 700)).astype(np.float32)
    z0 = rng.standard_normal((5, 2)).astype(np.float32)
    seq, _ = iir._sos_scan(jnp.asarray(x), coeffs.sos,
                           jnp.asarray(z0)[:, None, :])
    blk = iir._biquad_block_parallel(jnp.asarray(x), sec, 64,
                                     z0=jnp.asarray(z0))
    np.testing.assert_allclose(np.asarray(blk), np.asarray(seq),
                               rtol=1e-4, atol=1e-5)


def test_chain_entry_states_decay_truncation_bitwise(rng):
    """The Hillis-Steele entry-state chain skips levels whose operator
    A_blk^(2^j) has decayed below f32 resolution (iir.py).  For the HMS
    serving cascade (order-5 + order-6 bandpass, block=128) that drops the
    shift-64 level (max|A^64| ~ 7e-12): the filtered output must be
    BITWISE identical to the untruncated chain, and the 60 Hz Q=30 notch
    (slow pole decay) must keep every level."""
    import jax.numpy as jnp
    casc = iir.cascade(iir.butter_bandpass(0.5, 20.0, 200.0, 5),
                       iir.butter_bandpass(0.5, 20.0, 200.0, 6))
    _, _, A_blk, _ = iir._cascade_block_matmul_ops(casc.sos, 128)
    # the premise: some level's operator is genuinely below threshold
    A64 = np.linalg.matrix_power(A_blk, 64)
    assert np.abs(A64).max() < 1e-10
    x = (rng.standard_normal((3, 10000)) * 40).astype(np.float32)

    got = np.asarray(iir._cascade_block_matmul(jnp.asarray(x), casc.sos,
                                               block=128))

    # untruncated reference: same code path with the skip disabled
    import unittest.mock as mock

    def no_trunc(z_zs, A_blk_, hi):
        n = z_zs.shape[-2]
        s = z_zs
        A_pow = np.asarray(A_blk_, np.float64)
        shift = 1
        while shift < n:
            Aj = jnp.asarray(A_pow, z_zs.dtype)
            shifted = jnp.pad(
                s, [(0, 0)] * (s.ndim - 2) + [(shift, 0), (0, 0)])[..., :n, :]
            s = s + jnp.matmul(shifted, Aj.T, precision=hi)
            A_pow = A_pow @ A_pow
            shift *= 2
        return jnp.pad(s, [(0, 0)] * (s.ndim - 2) + [(1, 0), (0, 0)]
                       )[..., :n, :]

    with mock.patch.object(iir, "_chain_entry_states", no_trunc):
        want = np.asarray(iir._cascade_block_matmul(jnp.asarray(x), casc.sos,
                                                    block=128))
    np.testing.assert_array_equal(got, want)

    # the notch keeps all levels: its A_blk decays too slowly to truncate
    notch = iir.iirnotch(60.0, 30.0, 200.0)
    _, _, A_n, _ = iir._cascade_block_matmul_ops(notch.sos, 128)
    n_blocks = 8  # 1024-sample signal
    A_pow, levels = A_n.astype(np.float64), 0
    shift = 1
    while shift < n_blocks:
        if np.abs(A_pow).max() < 1e-10:
            break
        levels += 1
        A_pow = A_pow @ A_pow
        shift *= 2
    assert levels == 3  # ceil(log2(8)) — nothing truncated
