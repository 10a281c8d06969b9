"""Batching + host→device prefetch.

The reference burns up to 120 worker processes per DataLoader running
scipy per sample (XAI_Multimodality.py:294, hot loop #5).  Here the host
only slices raw numpy windows into batches; preprocessing is fused
on-device, and a double-buffered prefetcher overlaps H2D transfer of the
next batch with compute on the current one.
"""

from __future__ import annotations

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
                       sharding: Optional[Any] = None,
                       sync_transfers: bool = False
                       ) -> Iterator[Dict[str, jax.Array]]:
    """Background-thread prefetcher: stages ``size`` batches ahead on
    device (optionally with a sharding) so H2D copies overlap compute —
    the TPU analogue of DataLoader worker prefetching.

    Producer exceptions (corrupt parquet, device OOM) re-raise in the
    consumer rather than hanging it, and closing/abandoning the generator
    stops the producer and releases its staged device batches.

    ``sync_transfers=True`` makes it safe for ``iterator`` to reuse host
    buffers (``MultimodalSource.batches(reuse_buffers=True)``): on an
    accelerator backend the producer blocks until each batch's H2D copy
    has completed before requesting the next batch (PJRT transfers are
    asynchronous and only promise not to read the source after
    completion); on the CPU backend ``device_put`` is ZERO-COPY — the
    device array aliases the host buffer — so the batch is copied up
    front instead.  Compute overlap is preserved either way — the
    consumer still runs ahead on the staged queue.
    """
    import queue as _queue

    q: "_queue.Queue" = _queue.Queue(maxsize=size)
    stop = threading.Event()
    _DONE, _ERR = object(), object()

    if sync_transfers:
        plat = (next(iter(sharding.device_set)).platform
                if sharding is not None else jax.default_backend())
        copy_first = plat == "cpu"
    else:
        copy_first = False

    def put_batch(batch):
        if copy_first:
            batch = {k: np.array(v, copy=True) if isinstance(v, np.ndarray)
                     else v for k, v in batch.items()}
        if sharding is not None:
            dev = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        else:
            dev = {k: jax.device_put(v) for k, v in batch.items()}
        if sync_transfers and not copy_first:
            for v in dev.values():
                v.block_until_ready()
        return dev

    def enqueue(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except _queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not enqueue(put_batch(batch)):
                    return
        except BaseException as e:                   # noqa: BLE001
            enqueue((_ERR, e))
            return
        enqueue(_DONE)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
                raise item[1]
            yield item
    finally:
        stop.set()
        # drain until the producer thread is dead: a single drain pass races
        # a producer blocked in put() (it can fill the slot the drain just
        # freed and decode one more batch after close).  Bounded: if the
        # producer is stuck upstream of put() (daemon thread) give up after
        # ~5 s rather than hanging the consumer.
        import time as _time
        deadline = _time.monotonic() + 5.0
        while t.is_alive() and _time.monotonic() < deadline:
            try:
                q.get_nowait()
            except _queue.Empty:
                t.join(timeout=0.1)
        # final sweep for anything staged between the last get and join
        while True:
            try:
                q.get_nowait()
            except _queue.Empty:
                break
