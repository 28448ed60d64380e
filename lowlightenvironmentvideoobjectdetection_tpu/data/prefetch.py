"""Host-side async prefetching for training input pipelines.

The reference overlaps data loading with GPU compute via torch DataLoader
worker processes (mmtrack/datasets/builder.py:44-76 + worker seeding). The
TPU-native equivalent: a background thread pool drives the (numpy) pipeline
and keeps a bounded queue of device-ready batches, so the host pipeline
overlaps the compiled train step. Threads suffice — the heavy work (decode,
resize) releases the GIL inside cv2/numpy.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class PrefetchIterator:
    """Wraps an iterator; a worker thread keeps ``buffer_size`` items ready."""

    _SENTINEL = object()

    def __init__(self, it: Iterable, buffer_size: int = 2,
                 num_threads: int = 1):
        self._q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._src = iter(it)
        self._err: Optional[BaseException] = None
        self._lock = threading.Lock()
        self._done = False
        self._sentinels = 0
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_threads)
        ]
        for t in self._threads:
            t.start()

    def _worker(self):
        while True:
            try:
                with self._lock:
                    item = next(self._src)
            except StopIteration:
                self._q.put(self._SENTINEL)
                return
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
                self._q.put(self._SENTINEL)
                return
            self._q.put(item)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        if self._done:
            raise StopIteration
        # with num_threads > 1, one worker may hit StopIteration (and enqueue
        # its sentinel) while others still have items in flight behind it —
        # stop only after ALL workers have signalled, so no item is lost
        while True:
            item = self._q.get()
            if item is not self._SENTINEL:
                return item
            self._sentinels += 1
            if self._sentinels >= len(self._threads):
                self._done = True
                if self._err is not None:
                    raise self._err
                raise StopIteration


def prefetch(it: Iterable, buffer_size: int = 2) -> PrefetchIterator:
    """``for batch in prefetch(data_iter):`` — batches are produced ahead of
    consumption on a background thread."""
    return PrefetchIterator(it, buffer_size=buffer_size)
