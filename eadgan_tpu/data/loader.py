"""Batching and host->device prefetching.

The reference leans on torch's multi-worker C++ DataLoader (N6 in
SURVEY.md 2.2).  On TPU the datasets here fit in host RAM as numpy
arrays, so the pipeline reduces to: shuffled epoch batching on the host,
plus a one-deep background thread that issues the next batch's
``device_put`` (optionally sharded over the mesh) while the current
step executes — overlapping the PCIe/ICI copy with compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np

__all__ = ["epoch_batches", "Prefetcher"]


def epoch_batches(
    data: np.ndarray,
    batch_size: int,
    rng: np.random.Generator,
    *,
    labels: Optional[np.ndarray] = None,
    drop_last: bool = True,
) -> Iterator:
    """Shuffled minibatches for one epoch (torch DataLoader
    ``shuffle=True`` parity; ``drop_last`` keeps shapes static for jit)."""
    n = data.shape[0]
    perm = rng.permutation(n)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = perm[start : start + batch_size]
        if labels is None:
            yield data[idx]
        else:
            yield data[idx], labels[idx]


class Prefetcher:
    """Wrap a host batch iterator; stage the next device transfer in a
    background thread so the accelerator never waits on H2D.

    ``place`` maps a host batch to device array(s) — e.g.
    ``lambda b: shard_batch(mesh, b)`` or a plain ``jax.device_put``.
    """

    def __init__(
        self,
        batches: Iterable,
        place: Optional[Callable] = None,
        depth: int = 2,
    ):
        self._place = place or jax.device_put
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that aborts when the consumer closes us."""
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in batches:
                    if not put(self._place(batch)):
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Release the worker and any staged device batches (call when
        abandoning the iterator early, e.g. on a max_steps cutoff)."""
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is self._sentinel:
                if self._err is not None:
                    raise self._err
                return
            yield item
