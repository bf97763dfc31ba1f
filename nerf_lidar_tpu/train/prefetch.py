"""Host-side batch prefetching.

SURVEY.md section 7.3 ranks input-pipeline throughput a top hard part: the
reference keeps chips fed with 8 torch DataLoader workers (train.py:111).
Here a small thread pool builds numpy batches ahead of the training loop and
stages them onto the device (device_put overlaps with the running step), so
the jitted step never waits on ray generation.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class BatchPrefetcher:
    """Runs `make_batch()` in `num_workers` threads, keeps up to `depth`
    device-staged batches ready."""

    def __init__(self, make_batch: Callable[[], dict], depth: int = 3,
                 num_workers: int = 2, sharding=None):
        self._make = make_batch
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._sharding = sharding
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_workers)]
        for t in self._threads:
            t.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self._make()
                staged = jax.device_put(batch, self._sharding) \
                    if self._sharding is not None else jax.device_put(batch)
                # Retry the SAME staged batch until it fits (dropping it on
                # Full would rebuild from scratch and spin a core whenever
                # the queue is ahead of the consumer).
                while not self._stop.is_set():
                    try:
                        self._q.put(staged, timeout=1.0)
                        break
                    except queue.Full:
                        continue
            except Exception:
                if not self._stop.is_set():
                    raise
                return

    def next(self):
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
