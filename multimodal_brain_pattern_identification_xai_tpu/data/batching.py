"""Batching + host→device prefetch.

The reference burns up to 120 worker processes per DataLoader running
scipy per sample (XAI_Multimodality.py:294, hot loop #5).  Here the host
only slices raw numpy windows into batches; preprocessing is fused
on-device, and a double-buffered prefetcher overlaps H2D transfer of the
next batch with compute on the current one.
"""

from __future__ import annotations

import collections
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np


def batch_iterator(arrays: Dict[str, np.ndarray], batch_size: int,
                   shuffle: bool = False, seed: int = 0,
                   drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Yield dict batches from equally-sized host arrays."""
    n = len(next(iter(arrays.values())))
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    stop = (n // batch_size) * batch_size if drop_last else n
    for s in range(0, stop, batch_size):
        sel = idx[s:s + batch_size]
        yield {k: v[sel] for k, v in arrays.items()}


def multimodal_batch_iterator(eeg: np.ndarray, spec: np.ndarray,
                              y: np.ndarray, batch_size: int,
                              shuffle: bool = False, seed: int = 0
                              ) -> Iterator[Dict[str, np.ndarray]]:
    """CombinedDataset equivalent (XAI_Multimodality.py:1114-1307) —
    label-consistency is by construction (single y array)."""
    return batch_iterator({"eeg": eeg, "spec": spec, "y": y}, batch_size,
                          shuffle, seed)


def prefetch_to_device(iterator: Iterable[Dict[str, np.ndarray]],
                       size: int = 2,
                       sharding: Optional[Any] = None
                       ) -> Iterator[Dict[str, jax.Array]]:
    """Background-thread prefetcher: stages ``size`` batches ahead on
    device (optionally with a sharding) so H2D copies overlap compute —
    the TPU analogue of DataLoader worker prefetching."""
    queue: "collections.deque" = collections.deque()
    sem = threading.Semaphore(size)
    done = object()

    def put(batch):
        if sharding is not None:
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    def producer():
        for batch in iterator:
            sem.acquire()
            queue.append(put(batch))
        queue.append(done)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        while not queue:
            t.join(timeout=0.001)
        item = queue.popleft()
        if item is done:
            return
        sem.release()
        yield item
