"""Native host-runtime tests: compile, NaN-repair parity with the numpy
fallback, batch queue completeness under shuffling."""

import numpy as np

from multimodal_brain_pattern_identification_xai_tpu import runtime


def test_native_builds():
    assert runtime.native_available(), "g++ build of hostloader.so failed"


def test_gather_windows_matches_numpy(rng):
    src = rng.standard_normal((10, 4, 50)).astype(np.float32)
    src[2, 1, 5:9] = np.nan
    src[7, 3, :] = np.nan
    idx = np.array([2, 7, 0, 2], np.int64)
    got = runtime.gather_windows(src, idx, n_threads=3)
    out = src[idx].copy()
    mean = np.nanmean(out, axis=-1, keepdims=True)
    mean = np.where(np.isnan(mean), 0.0, mean)
    ref = np.where(np.isnan(out), mean, out)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    assert np.isfinite(got).all()


def test_batch_queue_yields_all_batches(rng):
    n, b = 40, 8
    x = rng.standard_normal((n, 3, 20)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, n)]
    q = runtime.NativeBatchQueue(x, y, b, shuffle=True, seed=1, n_workers=3)
    assert len(q) == 5
    batches = list(q)
    assert len(batches) == 5
    # every record appears exactly once (shuffle is a permutation)
    seen = np.concatenate([bb["x"][:, 0, 0] for bb in batches])
    np.testing.assert_allclose(np.sort(seen), np.sort(x[:, 0, 0]))
    # labels stay aligned with their windows
    for bb in batches:
        for i in range(b):
            j = np.argmin(np.abs(x[:, 0, 0] - bb["x"][i, 0, 0]))
            np.testing.assert_allclose(bb["y"][i], y[j])


def test_batch_queue_multiple_epochs(rng):
    x = rng.standard_normal((16, 2, 10)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, 16)]
    q = runtime.NativeBatchQueue(x, y, 4, shuffle=False)
    assert len(list(q)) == 4
    assert len(list(q)) == 4  # re-iterable


def test_gather_multimodal_native_matches_fallback(monkeypatch, rng):
    """The C++ combined gather (strided EEG copy + ragged spectrogram
    crop/transpose/pad) is bit-identical to the numpy fallback, including
    crop overruns past the plane end."""
    from multimodal_brain_pattern_identification_xai_tpu.runtime import loader

    eeg = rng.standard_normal((5, 3, 40)).astype(np.float32)
    planes = [rng.standard_normal((r, 7)).astype(np.float32)
              for r in (20, 35, 10)]
    lens = np.array([20, 35, 10], np.int64)
    off = np.array([0, 20, 55], np.int64)
    buf = np.concatenate(planes)
    eeg_idx = np.array([4, 0, 2, 2], np.int64)
    spec_idx = np.array([0, 1, 2, 1], np.int64)
    start = np.array([0, 30, 5, 2], np.int64)   # row 1 overruns → zero pad
    native = runtime.gather_multimodal(eeg, eeg_idx, buf, off, lens,
                                       spec_idx, start, width=16)
    assert runtime.native_available()
    monkeypatch.setattr(loader, "_load_lib", lambda: None)
    fallback = loader.gather_multimodal(eeg, eeg_idx, buf, off, lens,
                                        spec_idx, start, width=16)
    for a, b in zip(native, fallback):
        np.testing.assert_array_equal(a, b)
    # overrun portion really is zero-padded
    assert native[1][1, :, 5:].max() == 0.0


def test_gather_multimodal_out_buffers_identical(rng):
    """gather_multimodal(out=...) fills preallocated buffers bit-identically
    to fresh allocation, and a reused slot is fully overwritten — including
    the zero-pad tail, which must not leak the previous batch."""
    from multimodal_brain_pattern_identification_xai_tpu.runtime import loader

    eeg = rng.standard_normal((6, 3, 40)).astype(np.float32)
    planes = [rng.standard_normal((r, 7)).astype(np.float32)
              for r in (20, 35, 10)]
    lens = np.array([20, 35, 10], np.int64)
    off = np.array([0, 20, 55], np.int64)
    buf = np.concatenate(planes)
    W = 16
    out = (np.empty((4, 3, 40), np.float32), np.empty((4, 7, W), np.float32))
    out[1][:] = 123.0                           # poison the pad region

    def batch(eeg_idx, spec_idx, start):
        args = (eeg, np.asarray(eeg_idx, np.int64), buf, off, lens,
                np.asarray(spec_idx, np.int64), np.asarray(start, np.int64))
        fresh = runtime.gather_multimodal(*args, width=W)
        reused = runtime.gather_multimodal(*args, width=W, out=out)
        assert reused[0] is out[0] and reused[1] is out[1]
        for a, b in zip(fresh, reused):
            np.testing.assert_array_equal(a, b)

    batch([0, 1, 2, 3], [0, 1, 2, 1], [0, 30, 5, 2])   # overruns → pad
    batch([5, 4, 0, 0], [2, 2, 0, 1], [0, 0, 10, 0])   # reuse the ring slot

    # numpy fallback honors out= with the same semantics
    lib = loader._load_lib
    try:
        loader._load_lib = lambda: None
        batch([0, 1, 2, 3], [0, 1, 2, 1], [0, 30, 5, 2])
    finally:
        loader._load_lib = lib


def test_batch_queue_pop_ring_matches_fresh(rng):
    """pop_ring reuse yields the same batch sequence as fresh allocation
    (copy-on-consume; a slot is recycled after pop_ring further pops)."""
    n, b = 40, 8
    x = rng.standard_normal((n, 3, 20)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, n)]
    fresh = [{k: v.copy() for k, v in bb.items()}
             for bb in runtime.NativeBatchQueue(x, y, b, shuffle=True,
                                                seed=9, n_workers=3)]
    ringed = [{k: v.copy() for k, v in bb.items()}
              for bb in runtime.NativeBatchQueue(x, y, b, shuffle=True,
                                                 seed=9, n_workers=3,
                                                 pop_ring=3)]
    assert len(fresh) == len(ringed) == 5
    # workers publish in sequence order (ordered-push queue), so the two
    # runs must match positionally, not just as sets
    for a, bb in zip(fresh, ringed):
        np.testing.assert_array_equal(a["x"], bb["x"])
        np.testing.assert_array_equal(a["y"], bb["y"])


def test_batch_queue_order_deterministic(rng):
    """Workers gather concurrently but publish in epoch-permutation order:
    the consumer sees batch b's rows exactly at position b regardless of
    worker count — the property that makes resume fast-forward (skip the
    first N batches of the seed-ep stream) equal to an uninterrupted run."""
    n, b = 64, 4
    x = rng.standard_normal((n, 2, 12)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, n)]
    q = runtime.NativeBatchQueue(x, y, b, shuffle=True, seed=7, n_workers=4)
    order = q.order                      # the epoch permutation
    for k, bb in enumerate(q):
        expect = order[k * b:(k + 1) * b]
        np.testing.assert_array_equal(bb["x"], x[expect])
        np.testing.assert_array_equal(bb["y"], y[expect])


def test_gather_multimodal_want_single_modality(monkeypatch, rng):
    """want=("eeg",)/("spec",) skips the other modality (returned None)
    and matches the corresponding half of the full gather — native and
    numpy fallback."""
    from multimodal_brain_pattern_identification_xai_tpu.runtime import loader

    eeg = rng.standard_normal((5, 3, 40)).astype(np.float32)
    planes = [rng.standard_normal((r, 7)).astype(np.float32)
              for r in (20, 35, 10)]
    lens = np.array([20, 35, 10], np.int64)
    off = np.array([0, 20, 55], np.int64)
    buf = np.concatenate(planes)
    args = (eeg, np.array([4, 0, 2], np.int64), buf, off, lens,
            np.array([0, 1, 2], np.int64), np.array([0, 30, 5], np.int64))

    def check():
        full = runtime.gather_multimodal(*args, width=16)
        e_only = runtime.gather_multimodal(*args, width=16, want=("eeg",))
        s_only = runtime.gather_multimodal(*args, width=16, want=("spec",))
        assert e_only[1] is None and s_only[0] is None
        np.testing.assert_array_equal(e_only[0], full[0])
        np.testing.assert_array_equal(s_only[1], full[1])

    assert runtime.native_available()
    check()
    monkeypatch.setattr(loader, "_load_lib", lambda: None)
    check()


def test_batch_queue_pop_ring_numpy_fallback(monkeypatch, rng):
    from multimodal_brain_pattern_identification_xai_tpu.runtime import loader

    x = rng.standard_normal((16, 2, 10)).astype(np.float32)
    x[3, 1, 2:5] = np.nan
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, 16)]
    # n_workers=1 so native emission order is deterministic (sequential)
    # and positional comparison against the sequential fallback is valid
    native = [{k: v.copy() for k, v in bb.items()}
              for bb in runtime.NativeBatchQueue(x, y, 4, shuffle=False,
                                                 pop_ring=2, n_workers=1)]
    monkeypatch.setattr(loader, "_load_lib", lambda: None)
    fallback = [{k: v.copy() for k, v in bb.items()}
                for bb in runtime.NativeBatchQueue(x, y, 4, shuffle=False,
                                                   pop_ring=2, n_workers=1)]
    for a, bb in zip(native, fallback):
        np.testing.assert_allclose(a["x"], bb["x"], rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(a["y"], bb["y"])
    assert all(np.isfinite(bb["x"]).all() for bb in fallback)
