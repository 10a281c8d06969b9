"""Real-HMS-dataset composition: metadata → caches → batch sources.

This is the glue the reference spreads across its entry scripts:

* vote aggregation per ``eeg_id``            (main.py:108-122)
* EEG window cache build/load                (main.py:84-98)
* per-row multimodal sample assembly         (XAI_Multimodality.py:694-886,
                                              1114-1307 CombinedDataset)
* canonical WaveNet CV arrays                (main_2.py:259-413)

Host code only reads parquet and gathers windows; ALL signal processing
runs on-device (:mod:`..ops`).  Batch sources yield raw numpy windows that
the CLI maps through one jitted preprocessing program per batch.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from .. import config as C
from .loader import (EEGRecordCache, load_eeg_parquet,
                     load_spectrogram_parquet, load_train_metadata)

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Metadata
# ---------------------------------------------------------------------------

def aggregate_votes_by_eeg(meta) -> Dict[str, np.ndarray]:
    """Collapse train.csv rows to one record per ``eeg_id`` with summed,
    normalized vote targets (main.py:108-122): first patient_id and
    expert_consensus, per-class vote sums → probability targets.

    Returns dict of aligned arrays: ``eeg_id``, ``patient_id``, ``y``
    (N, 6) float32, ``consensus`` (class names).
    """
    grouped = meta.groupby("eeg_id", sort=True)
    first = grouped[["patient_id", "expert_consensus"]].agg("first")
    votes = grouped[list(C.TGT_VOTE_COLS)].agg("sum").to_numpy(np.float64)
    y = votes / np.maximum(votes.sum(axis=1, keepdims=True), 1e-12)
    return {
        "eeg_id": first.index.to_numpy(np.int64),
        "patient_id": first["patient_id"].to_numpy(np.int64),
        "y": y.astype(np.float32),
        "consensus": first["expert_consensus"].to_numpy(),
    }


def onehot_consensus(consensus: Sequence[str]) -> np.ndarray:
    """Expert-consensus names → one-hot probability targets — the notebook
    pipeline's ``labels_to_probabilities`` (XAI_Multimodality.py:884-886)."""
    idx = np.asarray([C.NAME2LABEL[name] for name in consensus])
    return np.eye(C.N_CLASSES, dtype=np.float32)[idx]


# ---------------------------------------------------------------------------
# Caches
# ---------------------------------------------------------------------------

def build_or_load_eeg_cache(cache_path: str, eeg_dir: str,
                            eeg_ids: Sequence[int],
                            n_points: int = 10_000,
                            n_workers: int = 8) -> EEGRecordCache:
    """Load the npz window cache if present, else sweep the parquet dir
    (threaded) and persist it — the reference's build-if-missing logic
    (main.py:84-98)."""
    if os.path.exists(cache_path):
        cache = EEGRecordCache.load(cache_path)
        # a cache built at a different n_points must not be extended (mixed
        # window lengths would break the np.stack in wavenet_arrays)
        stale = (len(cache) > 0
                 and next(iter(cache._store.values())).shape[0] != n_points)
        if stale:
            logger.info("eeg cache window length mismatch, rebuilding")
            cache = EEGRecordCache(cache_path)
            cache.build(eeg_dir, eeg_ids, n_points=n_points,
                        n_workers=n_workers)
            cache.save()
            return cache
        missing = [e for e in eeg_ids if e not in cache]
        if not missing:
            logger.info("eeg cache hit: %s (%d records)", cache_path,
                        len(cache))
            return cache
        # incremental: fetch only the missing ids and merge (a --limit run
        # followed by a full run must not re-decode the cached windows)
        logger.info("eeg cache partial hit (%d missing), extending",
                    len(missing))
        cache.build(eeg_dir, missing, n_points=n_points, n_workers=n_workers)
    else:
        cache = EEGRecordCache(cache_path)
        cache.build(eeg_dir, eeg_ids, n_points=n_points, n_workers=n_workers)
    cache.save()
    logger.info("built eeg cache: %d records → %s", len(cache), cache_path)
    return cache


class SpectrogramStore:
    """Raw Kaggle spectrograms keyed by ``spectrogram_id``: (T, 400)
    float32, time-major, lazily loaded with an optional threaded preload.

    Sources either the parquet directory or a pre-converted ``.npy`` dir
    (``cli convert-spectrograms`` output, stored (Freq, Time) — reference
    main3.py:79-94)."""

    def __init__(self, spec_dir: str, npy_dir: Optional[str] = None):
        self.spec_dir = spec_dir
        self.npy_dir = npy_dir
        self._store: Dict[int, np.ndarray] = {}

    def _load(self, spec_id: int) -> np.ndarray:
        if self.npy_dir is not None:
            p = os.path.join(self.npy_dir, f"{spec_id}.npy")
            if os.path.exists(p):
                return np.load(p).T.astype(np.float32)     # → (T, 400)
        return load_spectrogram_parquet(self.spec_dir, spec_id)

    def preload(self, spec_ids: Sequence[int], n_workers: int = 8) -> None:
        ids = sorted({int(s) for s in spec_ids} - set(self._store))
        if not ids:
            return
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            for sid, arr in zip(ids, pool.map(self._load, ids)):
                self._store[sid] = arr
        logger.info("preloaded %d spectrograms", len(ids))

    def __getitem__(self, spec_id: int) -> np.ndarray:
        sid = int(spec_id)
        if sid not in self._store:
            self._store[sid] = self._load(sid)
        return self._store[sid]

    def __len__(self) -> int:
        return len(self._store)


# ---------------------------------------------------------------------------
# WaveNet CV arrays (canonical driver, main_2.py:259-413)
# ---------------------------------------------------------------------------

def wavenet_arrays(paths: "C.PathsConfig", cache_dir: str,
                   n_points: int = 10_000, n_workers: int = 8,
                   limit: Optional[int] = None
                   ) -> Dict[str, np.ndarray]:
    """Metadata CSV → vote aggregation → window cache → aligned arrays.

    Returns ``{"x": (N, n_points, 20) raw µV windows, "y": (N, 6) soft
    targets, "groups": patient ids, "eeg_id": ids}`` — the host-side input
    to ``ops.eeg_transform`` + ``train.run_cv``.
    """
    meta = load_train_metadata(paths.train_csv)
    agg = aggregate_votes_by_eeg(meta)
    ids = agg["eeg_id"][:limit] if limit else agg["eeg_id"]
    cache = build_or_load_eeg_cache(
        os.path.join(cache_dir, "eeg_cache.npz"), paths.train_eegs, ids,
        n_points=n_points, n_workers=n_workers)
    x = np.stack([cache[e] for e in ids])           # (N, n_points, 20)
    n = len(ids)
    return {"x": x, "y": agg["y"][:n], "groups": agg["patient_id"][:n],
            "eeg_id": ids}


# ---------------------------------------------------------------------------
# Multimodal per-row batch source (notebook pipeline, §3.4)
# ---------------------------------------------------------------------------

class MultimodalSource:
    """Per-row raw-sample source for the combined EEG+spectrogram pipeline.

    Each metadata row maps to ``{"eeg": (20, 10000) µV window,
    "spec": (400, 300) offset-cropped plane, "y": (6,) one-hot}`` —
    the CombinedDataset contract (XAI_Multimodality.py:1114-1307) with
    label consistency by construction.  Batches stay raw; the device does
    the DSP (``ops.preprocess_multimodal``).

    Construction builds RESIDENT float32 stores (a stacked EEG window
    array + a concatenated ragged spectrogram buffer) and per-row index /
    crop-start arrays once; ``gather`` is then one call into the C++
    runtime (``runtime.gather_multimodal``: threaded strided copy + crop/
    transpose/pad) with a vectorized-numpy fallback — no per-batch pandas
    iteration on the hot path.
    """

    def __init__(self, meta, eeg_cache: EEGRecordCache,
                 spec_store: SpectrogramStore,
                 spec_width: int = 300, n_threads: int = 4):
        from ..runtime import gather_multimodal
        self._gather_native = gather_multimodal
        self.meta = meta.reset_index(drop=True)
        self.spec_width = spec_width
        self.n_threads = n_threads
        self.y = onehot_consensus(self.meta["expert_consensus"])

        eeg_ids = self.meta["eeg_id"].to_numpy(np.int64)
        uniq_eeg, eeg_row2u = np.unique(eeg_ids, return_inverse=True)
        # preallocate-and-fill (not np.stack over a list of copies): caps
        # the transient peak at cache + stack instead of 3× the data size
        first = eeg_cache[uniq_eeg[0]]
        self._eeg_stack = np.empty(
            (len(uniq_eeg), first.shape[1], first.shape[0]), np.float32)
        for i, e in enumerate(uniq_eeg):                 # (U, 20, 10000)
            self._eeg_stack[i] = eeg_cache[e].T
        self._eeg_row2u = eeg_row2u.astype(np.int64)

        spec_ids = self.meta["spectrogram_id"].to_numpy(np.int64)
        uniq_spec, spec_row2u = np.unique(spec_ids, return_inverse=True)
        planes = [np.asarray(spec_store[s], np.float32) for s in uniq_spec]
        lens = np.asarray([p.shape[0] for p in planes], np.int64)
        self._spec_buf = (np.concatenate(planes, axis=0) if planes
                          else np.zeros((0, 400), np.float32))
        self._spec_off = (np.concatenate([[0], np.cumsum(lens)[:-1]])
                          .astype(np.int64) if len(lens)
                          else np.zeros(0, np.int64))
        self._spec_len = lens
        self._spec_row2u = spec_row2u.astype(np.int64)

        # per-row crop start, exactly crop_spectrogram's semantics
        # (offset//2 when present and within the plane, else 0)
        col = "spectrogram_label_offset_seconds"
        if col in self.meta.columns:
            off = self.meta[col].to_numpy(np.float64)
        else:
            off = np.full(len(self.meta), np.nan)
        # clamp at 0: offsets are nonnegative in the HMS schema, and a
        # negative start must not index before the plane buffer
        offi = np.maximum(
            np.floor(np.nan_to_num(off, nan=0.0)).astype(np.int64) // 2, 0)
        rows_per = lens[self._spec_row2u]
        self._crop_start = np.where(~np.isnan(off) & (rows_per >= offi),
                                    offi, 0).astype(np.int64)

    def __len__(self) -> int:
        return len(self.meta)

    def gather(self, rows: np.ndarray,
               out: Optional[Tuple[np.ndarray, np.ndarray]] = None,
               want: Sequence[str] = ("eeg", "spec")
               ) -> Dict[str, np.ndarray]:
        """Assemble one raw batch for the given row indices (native).

        ``want`` selects the modalities to gather — a branch-pretraining
        run requesting only ``("spec",)`` skips the ~B·20·10000·4-byte
        strided EEG copy entirely (and vice versa); the returned dict
        contains only the requested keys plus ``y``.
        """
        rows = np.asarray(rows, np.int64)
        eeg, spec = self._gather_native(
            self._eeg_stack, self._eeg_row2u[rows], self._spec_buf,
            self._spec_off, self._spec_len, self._spec_row2u[rows],
            self._crop_start[rows], width=self.spec_width,
            n_threads=self.n_threads, out=out, want=want)
        res = {"y": self.y[rows]}
        if "eeg" in want:
            res["eeg"] = eeg
        if "spec" in want:
            res["spec"] = spec
        return res

    def batches(self, rows: np.ndarray, batch_size: int,
                shuffle: bool = False, seed: int = 0,
                drop_last: bool = True,
                reuse_buffers: bool = False,
                want: Sequence[str] = ("eeg", "spec")
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield raw batches of the ``want`` modalities (+ ``y``).

        ``reuse_buffers=True`` cycles a 2-slot ring of preallocated
        ``(eeg, spec)`` output pairs instead of allocating ~330 MB of
        fresh pages per batch (measured 2.1× faster host gather on the
        training path).  Contract: a yielded batch's arrays are only
        valid until the NEXT-plus-one batch is drawn — the intended
        consumer is ``data.prefetch_to_device(..., sync_transfers=True)``,
        which guarantees the H2D copy of batch *n* has completed before
        batch *n+1* is even requested, so slot *n* can be overwritten at
        batch *n+2*.  Do not retain host references under this flag.
        """
        rows = np.asarray(rows)
        if shuffle:
            rows = rows.copy()
            np.random.default_rng(seed).shuffle(rows)
        stop = ((len(rows) // batch_size) * batch_size if drop_last
                else len(rows))
        ring = None
        if reuse_buffers:
            c, t = self._eeg_stack.shape[1], self._eeg_stack.shape[2]
            f = self._spec_buf.shape[1]
            # unrequested modalities get no ring allocation either
            ring = [(np.empty((batch_size, c, t), np.float32)
                     if "eeg" in want else None,
                     np.empty((batch_size, f, self.spec_width), np.float32)
                     if "spec" in want else None)
                    for _ in range(2)]
        for k, s in enumerate(range(0, stop, batch_size)):
            sel = rows[s:s + batch_size]
            out = ring[k % 2] if ring is not None and len(sel) == batch_size \
                else None
            yield self.gather(sel, out=out, want=want)


def multimodal_source(paths: "C.PathsConfig", cache_dir: str,
                      n_workers: int = 8,
                      npy_dir: Optional[str] = None,
                      limit: Optional[int] = None) -> MultimodalSource:
    """Compose metadata + caches into a :class:`MultimodalSource`
    (create_k_fold_splits feed, XAI_Multimodality.py:539-571)."""
    meta = load_train_metadata(paths.train_csv)
    if limit:
        meta = meta.iloc[:limit]
    cache = build_or_load_eeg_cache(
        os.path.join(cache_dir, "eeg_cache.npz"), paths.train_eegs,
        meta["eeg_id"].unique(), n_workers=n_workers)
    store = SpectrogramStore(paths.train_spectr, npy_dir=npy_dir)
    store.preload(meta["spectrogram_id"].unique(), n_workers=n_workers)
    return MultimodalSource(meta, cache, store)
