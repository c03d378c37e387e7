"""Background-thread dataset prefetching — overlap host trial loading with
device compute.

The reference's DataLoader used worker processes for the same purpose
(/root/reference/processor.py:61-84 via torch DataLoader); here a thin
thread-pool view serves ``dataset[i]`` ahead of the training loop's mostly
sequential access pattern. Trial decoding (mmap reads, the native
npy_loader, CSV parsing) releases the GIL, so plain threads give real
overlap without worker-process serialization.

Works with any indexable dataset; correctness is access-order independent
(a miss just loads synchronously through the pool).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

__all__ = ["PrefetchedDataset"]


class PrefetchedDataset:
    """Indexable view over ``dataset`` that keeps the next ``ahead`` items
    loading on background threads.

    ``__getitem__(i)`` schedules ``i..i+ahead`` and blocks only on ``i``.
    Items are evicted once served, so repeated epoch passes re-prefetch.
    """

    def __init__(self, dataset, ahead: int = 4, threads: int = 2):
        self._ds = dataset
        self._ahead = max(1, ahead)
        self._pool = ThreadPoolExecutor(max_workers=max(1, threads))
        self._futures = {}

    def __len__(self):
        return len(self._ds)

    def __getattr__(self, name):
        # delegate auxiliary APIs (class_distribution helpers etc.)
        return getattr(self._ds, name)

    def _schedule(self, i):
        if 0 <= i < len(self._ds) and i not in self._futures:
            self._futures[i] = self._pool.submit(self._ds.__getitem__, i)

    def __getitem__(self, i):
        for j in range(i, i + self._ahead + 1):
            self._schedule(j)
        fut = self._futures.pop(i)
        return fut.result()

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
        self._futures.clear()
