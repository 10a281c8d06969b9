"""Parquet/CSV readers, window cropping and the one-time EEG cache
(reference load_train_eeg_frame/load_train_spectr_frame data_utils.py:72-95,
_get_eeg_window cfg_utils.py:354-389, cache sweep main.py:84-98)."""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

from .. import config as C


def load_train_metadata(csv_path: str):
    """train.csv with eeg_id / spectrogram_id / patient_id / offsets /
    expert_consensus / vote columns (main.py:67)."""
    import pandas as pd
    return pd.read_csv(csv_path)


def load_eeg_parquet(path_or_dir: str, eeg_id: Optional[int] = None,
                     skip_assert: bool = False) -> np.ndarray:
    """One EEG recording → (T, 20) float32 in EEG_COLUMNS order
    (load_train_eeg_frame, data_utils.py:72-84)."""
    import pandas as pd
    path = (os.path.join(path_or_dir, f"{eeg_id}.parquet")
            if eeg_id is not None else path_or_dir)
    df = pd.read_parquet(path)
    if not skip_assert:
        assert list(df.columns) == list(C.EEG_COLUMNS), \
            "EEG columns order is not the same!"
    return df.to_numpy(dtype=np.float32)


def load_spectrogram_parquet(path_or_dir: str,
                             spectrogram_id: Optional[int] = None,
                             skip_assert: bool = False) -> np.ndarray:
    """One Kaggle spectrogram → (T, 400) float32 (without the time column;
    load_train_spectr_frame, data_utils.py:87-95)."""
    import pandas as pd
    path = (os.path.join(path_or_dir, f"{spectrogram_id}.parquet")
            if spectrogram_id is not None else path_or_dir)
    df = pd.read_parquet(path)
    cols = [c for c in df.columns if c != "time"]
    return df[cols].to_numpy(dtype=np.float32)


def crop_eeg_window(eeg: np.ndarray, n_points: int = 10_000,
                    offset_seconds: Optional[float] = None,
                    fs: int = 200) -> np.ndarray:
    """Center-crop (or offset-crop) an (T, C) recording to ``n_points``
    rows with NaN→channel-mean fill (_get_eeg_window, cfg_utils.py:354-389).
    Returns (n_points, C)."""
    T = eeg.shape[0]
    if offset_seconds is not None:
        start = int(offset_seconds * fs)
    else:
        start = max(0, (T - n_points) // 2)
    win = eeg[start:start + n_points]
    if win.shape[0] < n_points:
        pad = np.zeros((n_points - win.shape[0], eeg.shape[1]), eeg.dtype)
        win = np.concatenate([win, pad], axis=0)
    win = win.copy()
    mean = np.nanmean(np.where(np.isnan(win), np.nan, win), axis=0)
    mean = np.where(np.isnan(mean), 0.0, mean)
    idx = np.where(np.isnan(win))
    win[idx] = np.take(mean, idx[1])
    return win.astype(np.float32)


def crop_spectrogram(spec_tc: np.ndarray,
                     offset_seconds: Optional[float] = None,
                     width: int = 300) -> np.ndarray:
    """Offset-crop + transpose to the (400, 300) model plane
    (HMS_Spectrogram_Dataset.__getitem__, XAI_Multimodality.py:713-726).

    ``spec_tc``: (T, 400) raw parquet (time-major).  The Kaggle
    spectrograms have one row per 2 s, hence ``offset // 2``.
    """
    raw = spec_tc
    if offset_seconds is not None:
        # clamped at 0 (offsets are nonnegative in the HMS schema; a
        # negative value must not wrap into tail-slicing)
        off = max(int(offset_seconds) // 2, 0)
        basic = raw[off:off + width, :] if raw.shape[0] >= off else raw
        pad = max(0, width - basic.shape[0])
        if pad:
            basic = np.pad(basic, ((0, pad), (0, 0)))
    else:
        basic = raw
    out = basic.T                                 # (400, ≥width)
    # pad/truncate to (400, width)
    if out.shape[1] < width:
        out = np.pad(out, ((0, 0), (0, width - out.shape[1])))
    return out[:400, :width].astype(np.float32)


class EEGRecordCache:
    """One-time sweep over all eeg_ids → {eeg_id: (n_points, C) f32},
    persisted to a single .npz (the reference pickles a dict to
    ``eegs_all_channles.npy``, main.py:84-98)."""

    def __init__(self, cache_path: str):
        self.cache_path = cache_path
        self._store: Dict[int, np.ndarray] = {}

    def build(self, eeg_dir: str, eeg_ids: Sequence[int],
              n_points: int = 10_000, n_workers: int = 8
              ) -> "EEGRecordCache":
        """Sweep the parquet directory into the window cache.

        Threaded: pyarrow's parquet decode releases the GIL, so the
        reference's serial host-I/O-bound sweep (main.py:84-98, ~17k
        files) parallelizes near-linearly with ``n_workers`` threads.
        """
        ids = [int(e) for e in eeg_ids]

        def one(eeg_id: int):
            raw = load_eeg_parquet(eeg_dir, eeg_id)
            return eeg_id, crop_eeg_window(raw, n_points)

        if n_workers > 1 and len(ids) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=n_workers) as pool:
                for eeg_id, win in pool.map(one, ids):
                    self._store[eeg_id] = win
        else:
            for eeg_id in ids:
                self._store[eeg_id] = one(eeg_id)[1]
        missing = set(ids) - set(self._store)
        assert not missing, f"cache build missed {len(missing)} ids"
        return self

    def save(self) -> None:
        np.savez_compressed(
            self.cache_path, **{str(k): v for k, v in self._store.items()})

    @classmethod
    def load(cls, cache_path: str) -> "EEGRecordCache":
        self = cls(cache_path)
        with np.load(cache_path) as z:
            self._store = {int(k): z[k] for k in z.files}
        return self

    def __getitem__(self, eeg_id: int) -> np.ndarray:
        return self._store[int(eeg_id)]

    def __len__(self) -> int:
        return len(self._store)

    def __contains__(self, eeg_id: int) -> bool:
        return int(eeg_id) in self._store
