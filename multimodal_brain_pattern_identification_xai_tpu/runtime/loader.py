"""ctypes facade over the C++ host loader (see hostloader.cpp)."""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostloader.cpp")
_LIB = os.path.join(_HERE, "libhostloader.so")


@functools.lru_cache(maxsize=1)
def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                    < os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", "-pthread", _SRC, "-o", _LIB],
                check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    lib = ctypes.CDLL(_LIB)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gather_windows.argtypes = [f32p, i64p, f32p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int]
    lib.gather_multimodal.argtypes = [f32p, i64p, f32p, i64p, i64p, i64p,
                                      i64p, f32p, f32p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int]
    lib.bq_create.restype = ctypes.c_void_p
    lib.bq_create.argtypes = [f32p, f32p, i64p, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_int, ctypes.c_int]
    lib.bq_next.restype = ctypes.c_int
    lib.bq_next.argtypes = [ctypes.c_void_p, f32p, f32p]
    lib.bq_num_batches.restype = ctypes.c_int64
    lib.bq_num_batches.argtypes = [ctypes.c_void_p]
    lib.bq_destroy.argtypes = [ctypes.c_void_p]
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_windows(src: np.ndarray, idx: np.ndarray,
                   n_threads: int = 4) -> np.ndarray:
    """out[i] = src[idx[i]] with per-channel NaN→mean repair.

    ``src``: (N, C, T) float32 contiguous.  Numpy fallback when the native
    library is unavailable.
    """
    out = np.empty((len(idx), src.shape[1], src.shape[2]), np.float32)
    return gather_windows_into(src, idx, out, n_threads)


def gather_windows_into(src: np.ndarray, idx: np.ndarray,
                        out: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """``gather_windows`` into a preallocated (B, C, T) buffer."""
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    B, C, T = len(idx), src.shape[1], src.shape[2]
    # hard checks, not asserts: these guard raw ctypes writes (a bad out
    # buffer would be silent heap corruption under python -O)
    if (out.shape != (B, C, T) or out.dtype != np.float32
            or not out.flags.c_contiguous):
        raise ValueError(f"out buffer must be C-contiguous float32 "
                         f"{(B, C, T)}, got {out.dtype} {out.shape}")
    lib = _load_lib()
    if lib is None:
        np.take(src, idx, axis=0, out=out)
        mean = np.nanmean(out, axis=-1, keepdims=True)
        mean = np.where(np.isnan(mean), 0.0, mean)
        np.copyto(out, np.where(np.isnan(out), mean, out))
        return out
    lib.gather_windows(_f32p(src), _i64p(idx), _f32p(out), B, C, T,
                       int(n_threads))
    return out


def gather_multimodal(eeg_src: np.ndarray, eeg_idx: np.ndarray,
                      spec_buf: np.ndarray, spec_off: np.ndarray,
                      spec_len: np.ndarray, spec_idx: np.ndarray,
                      crop_start: np.ndarray, width: int = 300,
                      n_threads: int = 4,
                      out: Optional[Tuple[Optional[np.ndarray],
                                          Optional[np.ndarray]]] = None,
                      want: Sequence[str] = ("eeg", "spec")
                      ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Assemble one combined EEG+spectrogram raw batch from resident
    stores (the native half of ``MultimodalSource.gather``): strided EEG
    copy + ragged spectrogram crop/transpose/pad.

    ``eeg_src``: (U, C, T); ``spec_buf``: concatenated (rows_i, F) planes.
    Returns ``(eeg (B, C, T), spec (B, F, width))``; a modality absent
    from ``want`` is skipped entirely (no copy, no allocation — the C
    side takes a null output pointer) and returned as None.  Numpy
    fallback when the native library is unavailable.

    ``out``: optional preallocated ``(eeg_out, spec_out)`` pair, filled
    and returned instead of fresh arrays (entries for unwanted modalities
    may be None).  Reusing buffers across batches skips ~330 MB of
    first-touch page faults per call (measured 2.1× on the gather) — the
    caller owns the aliasing contract (see
    ``MultimodalSource.batches(reuse_buffers=True)``).
    """
    want_eeg, want_spec = "eeg" in want, "spec" in want
    eeg_src = np.ascontiguousarray(eeg_src, np.float32)
    spec_buf = np.ascontiguousarray(spec_buf, np.float32)
    eeg_idx = np.ascontiguousarray(eeg_idx, np.int64)
    spec_off = np.ascontiguousarray(spec_off, np.int64)
    spec_len = np.ascontiguousarray(spec_len, np.int64)
    spec_idx = np.ascontiguousarray(spec_idx, np.int64)
    crop_start = np.ascontiguousarray(crop_start, np.int64)
    B = len(eeg_idx)
    C, T = eeg_src.shape[1], eeg_src.shape[2]
    F = spec_buf.shape[1]
    eeg = spec = None
    if out is not None:
        eeg, spec = out
        # hard checks, not asserts: these guard raw ctypes writes (a bad
        # out buffer would be silent heap corruption under python -O)
        if want_eeg and (eeg is None or eeg.shape != (B, C, T)
                         or eeg.dtype != np.float32
                         or not eeg.flags.c_contiguous):
            raise ValueError(
                f"eeg out buffer must be C-contiguous float32 {(B, C, T)}, "
                f"got {None if eeg is None else (eeg.dtype, eeg.shape)}")
        if want_spec and (spec is None or spec.shape != (B, F, width)
                          or spec.dtype != np.float32
                          or not spec.flags.c_contiguous):
            raise ValueError(
                f"spec out buffer must be C-contiguous float32 "
                f"{(B, F, width)}, got "
                f"{None if spec is None else (spec.dtype, spec.shape)}")
    if out is None:
        eeg = np.empty((B, C, T), np.float32) if want_eeg else None
        spec = np.empty((B, F, width), np.float32) if want_spec else None
    lib = _load_lib()
    if lib is None:
        if want_eeg:
            np.take(eeg_src, eeg_idx, axis=0, out=eeg)
        if want_spec:
            spec[:] = 0.0
            for i in range(B):
                s = spec_idx[i]
                plane = spec_buf[spec_off[s]:spec_off[s] + spec_len[s]]
                start = crop_start[i]
                avail = max(0, min(width, spec_len[s] - start))
                if avail:
                    spec[i, :, :avail] = plane[start:start + avail].T
        return eeg, spec
    lib.gather_multimodal(_f32p(eeg_src), _i64p(eeg_idx), _f32p(spec_buf),
                          _i64p(spec_off), _i64p(spec_len), _i64p(spec_idx),
                          _i64p(crop_start),
                          _f32p(eeg) if want_eeg else None,
                          _f32p(spec) if want_spec else None,
                          B, C, T, F, width, int(n_threads))
    return eeg, spec


class NativeBatchQueue:
    """Background-threaded batch assembly over a resident float32 store —
    the C++ replacement for the reference's multi-process DataLoader.

    Iterates ``{"x": (B, C, T), "y": (B, n_classes)}`` batches for one
    epoch.  Falls back to a single-threaded numpy path without g++.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int,
                 shuffle: bool = True, seed: int = 0, n_workers: int = 2,
                 capacity: int = 4, pop_ring: int = 0):
        self.x = np.ascontiguousarray(x, np.float32)
        self.y = np.ascontiguousarray(y, np.float32)
        self.batch_size = batch_size
        order = np.arange(len(x), dtype=np.int64)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        n = (len(order) // batch_size) * batch_size
        self.order = order[:n]
        self.n_workers = n_workers
        self.capacity = capacity
        #: >0 cycles a ring of ``pop_ring`` preallocated output pairs
        #: instead of fresh np.empty per pop (no first-touch page faults
        #: per batch).  Contract: a yielded batch is only valid until
        #: ``pop_ring`` further batches have been drawn — size it above
        #: the consumer's maximum number of simultaneously-held batches
        #: (e.g. gradient_accumulate_every + slack for the DiffEEG
        #: trainer, which stacks K micro-batches per step).
        self.pop_ring = pop_ring

    def __len__(self) -> int:
        return len(self.order) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        lib = _load_lib()
        B = self.batch_size
        C, T = self.x.shape[1], self.x.shape[2]
        K = self.y.shape[1]
        ring = [(np.empty((B, C, T), np.float32),
                 np.empty((B, K), np.float32))
                for _ in range(self.pop_ring)] if self.pop_ring else None
        k = 0
        if lib is None:
            for s in range(0, len(self.order), B):
                sel = self.order[s:s + B]
                if ring is not None:
                    xb, yb = ring[k % len(ring)]
                    k += 1
                    gather_windows_into(self.x, sel, xb)
                    np.take(self.y, sel, axis=0, out=yb)
                    yield {"x": xb, "y": yb}
                else:
                    yield {"x": gather_windows(self.x, sel),
                           "y": self.y[sel]}
            return
        handle = lib.bq_create(_f32p(self.x), _f32p(self.y),
                               _i64p(self.order), len(self.order),
                               C, T, K, B, self.n_workers, self.capacity)
        try:
            while True:
                if ring is not None:
                    xb, yb = ring[k % len(ring)]
                    k += 1
                else:
                    xb = np.empty((B, C, T), np.float32)
                    yb = np.empty((B, K), np.float32)
                if not lib.bq_next(ctypes.c_void_p(handle), _f32p(xb),
                                   _f32p(yb)):
                    return
                yield {"x": xb, "y": yb}
        finally:
            lib.bq_destroy(ctypes.c_void_p(handle))
