"""Host-side batch loading.

Replaces torch DataLoader (reference train.py:208-224) with a numpy
sampler + collate; the train loop cycles it indefinitely the way
``run_epoch`` does on StopIteration (reference train_utils.py:1286-1293).
Device transfer + sharding happen at the jit boundary (parallel layer).
"""

from __future__ import annotations

import numpy as np

from lipvq_tpu.utils.tensor_utils import stack_collate


class DataLoader:
    """Shuffling mini-batch iterator over a SequenceDataset.

    ``sampler`` (an iterable of indices, e.g. CustomWeightedRandomSampler
    from a weighted MetaDataset) overrides the shuffle order — the
    reference's weighted multi-dataset sampling path (dataset.py:1115)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, sampler=None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sampler = sampler
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        if self.sampler is not None:
            order = np.fromiter(iter(self.sampler), dtype=np.int64)
        elif self.shuffle:
            order = self._rng.permutation(len(self.dataset))
        else:
            order = np.arange(len(self.dataset))
        n = len(order)
        for i in range(0, n - (self.batch_size - 1 if self.drop_last else 0),
                       self.batch_size):
            idx = order[i : i + self.batch_size]
            if len(idx) == 0:
                break
            yield stack_collate([self.dataset[int(j)] for j in idx])


class PrefetchLoader:
    """Background-thread prefetching wrapper: overlaps host-side batch
    assembly (__getitem__ + collate) with device compute — the TPU-native
    stand-in for torch DataLoader's num_workers (reference
    train.py:208-224)."""

    def __init__(self, loader, prefetch: int = 2):
        self.loader = loader
        self.prefetch = max(1, int(prefetch))

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for item in self.loader:
                    q.put(item)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


class DevicePrefetchLoader:
    """Device-transfer prefetch: eagerly ``jax.device_put``s upcoming
    batches so the host->device copy (the dominant cost over a
    dev-tunnel, and a real cost on any host) overlaps the previous
    step's compute — the flax ``prefetch_to_device`` pattern. Compose
    outside PrefetchLoader: host assembly overlaps in a thread, device
    transfer overlaps via async dispatch."""

    def __init__(self, loader, size: int = 2, transform=None, put=None):
        self.loader = loader
        self.size = max(1, int(size))
        self.transform = transform  # host-side prep BEFORE device_put
        self.put = put  # device placement (e.g. a model's sharding put)

    def __len__(self):
        return len(self.loader)

    @staticmethod
    def _put(batch):
        import jax

        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x) if hasattr(x, "shape") else x, batch
        )

    def __iter__(self):
        import collections

        q: collections.deque = collections.deque()
        put = self.put or self._put
        for batch in self.loader:
            if self.transform is not None:
                batch = self.transform(batch)
            q.append(put(batch))
            if len(q) > self.size:
                yield q.popleft()
        while q:
            yield q.popleft()


class CyclingIterator:
    """Infinite iterator that restarts the loader on exhaustion
    (reference run_epoch's StopIteration handling)."""

    def __init__(self, loader):
        self.loader = loader
        self._it = iter(loader)

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self.loader)
            return next(self._it)

    def __iter__(self):
        return self
