"""Background-thread batch prefetching.

The reference trains through ``DataLoader(..., num_workers)`` so host-side
featurization/collation runs ahead of the accelerator
(datasets_utils/pdbbind.py:384-406).  The TPU rebuild's collation is
numpy-cheap but not free (padding + H2D transfer of ESM-wide receptor
arrays); ``prefetch`` overlaps it with device compute by running the batch
iterator in a daemon thread feeding a bounded queue (double-buffered by
default).  Device dispatch stays on the consumer thread -- the worker only
produces (already device-resident, since ``collate`` calls ``jnp.asarray``)
batches, so there is no JAX-thread-safety concern beyond array creation,
which is thread-safe.

Exceptions in the worker propagate to the consumer at the next ``__next__``.
Abandoning the iterator early (e.g. a ``--steps`` limit) must not leak a
thread blocked on ``put`` -- the worker checks a stop flag with a timeout,
and ``close()`` (also called by ``__del__`` and on exhaustion) sets it.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class _Sentinel:
    pass


_DONE = _Sentinel()


class Prefetcher(Iterator):
    """Iterate ``src`` with up to ``depth`` items materialized ahead."""

    def __init__(self, src: Iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, args=(iter(src),), daemon=True
        )
        self._thread.start()

    def _worker(self, it):
        try:
            for item in it:
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._put_final(_DONE)
        except BaseException as e:  # propagate to the consumer
            self._put_final(e)

    def _put_final(self, item):
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is _DONE:
            self.close()
            raise StopIteration
        if isinstance(item, BaseException):
            self.close()
            raise item
        return item

    def close(self):
        self._stop.set()

    def __del__(self):
        self.close()


def prefetch(src: Iterable, depth: int = 2) -> Prefetcher:
    """Wrap an iterable of batches in a background prefetcher."""
    return Prefetcher(src, depth=depth)
