"""Host-side prefetch pipeline.

TPU-shaped replacement for the reference's TorchIO ``Queue`` with 8 worker
processes (``src/data_module.py:152-166``): NIfTI reads and host preprocessing
overlap device compute via a bounded background thread pool, so the jitted
train step never waits on IO. (XLA dispatch is async; one queue of ready
host batches is enough to keep the chip fed — no process fan-out needed.)
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional


class PrefetchIterator:
    """Wrap an iterator; a daemon thread stays ``size`` items ahead."""

    _DONE = object()

    def __init__(self, it: Iterable, size: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=size)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(it),), daemon=True
        )
        self._thread.start()

    def _worker(self, it: Iterator) -> None:
        try:
            for item in it:
                self._queue.put(item)
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self._queue.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def parallel_map(
    fn: Callable, items, num_workers: int = 8, ordered: bool = True
):
    """Thread-pool map for IO-bound work (NIfTI loads). Mirrors the
    reference's loader parallelism knob (num_workers=8,
    ``src/data_module.py:15``)."""
    if num_workers <= 1:
        return [fn(x) for x in items]
    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        return list(ex.map(fn, items))
