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


def _close_dataset_files(dataset):
    """Close HDF5 handles so forked workers reopen their own (h5py
    handles are not fork-safe; SequenceDataset.hdf5_file is lazy)."""
    if hasattr(dataset, "close"):
        dataset.close()
    for member in getattr(dataset, "datasets", []) or []:
        if hasattr(member, "close"):
            member.close()


def _mp_worker(dataset, idx_q, out_q):
    _close_dataset_files(dataset)  # reopen lazily in this process
    while True:
        job = idx_q.get()
        if job is None:
            break
        epoch_id, idx = job
        batch = stack_collate([dataset[int(j)] for j in idx])
        out_q.put((epoch_id, batch))


class MultiprocessLoader:
    """N-worker-process batch loader — the counterpart of torch
    DataLoader(num_workers=5) in the reference image protocol
    (config_gen_utils.py:232-238, train.py:213).

    The single-thread DataLoader + PrefetchLoader pair is GIL-bound:
    at the image protocol (batch 16 x 10-frame x 2 image streams) the
    host ``__getitem__`` + collate path cannot keep a 68 ms device step
    fed on a small host. Workers are forked once and fed index batches
    through a queue; completed batches stream back in completion order
    (batch order within an epoch is irrelevant for SGD; the index
    PERMUTATION is still seeded and deterministic).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, sampler=None,
                 num_workers: int = 4, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sampler = sampler
        self.num_workers = max(1, int(num_workers))
        self.prefetch = max(2, int(prefetch))
        self._rng = np.random.default_rng(seed)
        self._procs = None
        self._idx_q = None
        self._out_q = None
        self._epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _ensure_workers(self):
        if self._procs is not None:
            return
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        # parent must drop its handles BEFORE the fork so children
        # don't inherit live h5py state
        _close_dataset_files(self.dataset)
        self._idx_q = ctx.Queue()
        self._out_q = ctx.Queue(maxsize=self.prefetch * self.num_workers)
        self._procs = [
            ctx.Process(
                target=_mp_worker,
                args=(self.dataset, self._idx_q, self._out_q),
                daemon=True,
            )
            for _ in range(self.num_workers)
        ]
        for p in self._procs:
            p.start()

    def shutdown(self):
        if self._procs is None:
            return
        for _ in self._procs:
            self._idx_q.put(None)
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._procs = None

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            self.shutdown()
        except Exception:
            pass

    def __iter__(self):
        self._ensure_workers()
        if self.sampler is not None:
            order = np.fromiter(iter(self.sampler), dtype=np.int64)
        elif self.shuffle:
            order = self._rng.permutation(len(self.dataset))
        else:
            order = np.arange(len(self.dataset))
        n_batches = len(self)
        self._epoch += 1
        epoch_id = self._epoch
        for b in range(n_batches):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            self._idx_q.put((epoch_id, idx))
        served = 0
        while served < n_batches:
            eid, batch = self._out_q.get()
            if eid != epoch_id:  # stale batch from an abandoned epoch
                continue
            served += 1
            yield batch


class DeviceCachedLoader:
    """HBM-resident corpus sampling (``train.hdf5_cache_mode="device"``).

    The reference's fastest path caches raw HDF5 in host RAM
    (``hdf5_cache_mode="all"``) and still assembles every batch on the
    host; on a 1-vCPU TPU host that per-step ``__getitem__`` + collate
    path dominates the epoch (measured on the 8-task kitchen mixture:
    24-28 s/epoch of host loading vs 4-6 s of device compute). This is
    the TPU-native cache mode: every windowed item is materialized ONCE,
    run through the model's batch preprocessing ONCE, and the stacked
    corpus lives in device HBM; each training batch is an on-device
    gather of freshly drawn indices. Steady-state host work per step is
    drawing ``batch_size`` integers.

    Weighted (MetaDataset) sampling is preserved by drawing indices
    from the sampler's per-item probabilities (``sampler.weights`` —
    the same distribution CustomWeightedRandomSampler draws from,
    reference dataset.py:1115-1131).

    Each leaf is stored deduplicated: rows are bitwise-hashed into a
    unique-row table + a per-item index map, and a batch gathers
    ``table[map[idx]]`` on device. Lossless, and load-bearing for
    item-constant leaves — per-frame ``lang_emb`` on the 8-task kitchen
    mixture is [35672, 10, 768] ≈ 1.1 GB with only 8 distinct rows
    (the raw stack stalled a 1-vCPU host for 14+ minutes in copies;
    deduplicated the whole corpus is ~70 MB).

    Batches come out already preprocessed (``preprocessed = True``):
    ``run_epoch`` must NOT call ``process_batch_for_training`` again —
    its host-side ``np.asarray`` would pull every batch back off the
    device.
    """

    preprocessed = True

    def __init__(self, dataset, batch_size: int, model, seed: int = 0,
                 sampler=None, max_bytes: float = 4e9, chunk: int = 4096):
        import jax
        import jax.numpy as jnp

        self.batch_size = int(batch_size)
        self._rng = np.random.default_rng(seed)
        p = getattr(sampler, "weights", None)
        self._p = None if p is None else np.asarray(p, np.float64)
        n = len(dataset)
        # materialize in chunks: bounded host peak memory, and the
        # model's preprocessing (obs processing, action-window slicing)
        # drops keys the train step never reads before they are stacked
        treedef = None
        uniq = tabs = maps = None
        for s in range(0, n, chunk):
            items = [dataset[i] for i in range(s, min(n, s + chunk))]
            proc = model.process_batch_for_training(stack_collate(items))
            leaves, treedef = jax.tree_util.tree_flatten(proc)
            if uniq is None:
                uniq = [{} for _ in leaves]
                tabs = [[] for _ in leaves]
                maps = [[] for _ in leaves]
            for li, leaf in enumerate(leaves):
                arr = np.ascontiguousarray(np.asarray(leaf))
                ids = np.empty(len(arr), np.int32)
                seen, tab = uniq[li], tabs[li]
                for r in range(len(arr)):
                    key = arr[r].tobytes()
                    j = seen.get(key)
                    if j is None:
                        j = len(tab)
                        seen[key] = j
                        tab.append(arr[r])
                    ids[r] = j
                maps[li].append(ids)
        del uniq
        tables = [np.stack(tab) for tab in tabs]
        nbytes = sum(t.nbytes for t in tables)
        if nbytes > max_bytes:
            raise ValueError(
                f"device corpus cache would be {nbytes / 1e9:.2f} GB "
                f"(> {max_bytes / 1e9:.1f} GB); use hdf5_cache_mode="
                f"'low_dim' for this dataset (image-scale corpora do "
                f"not fit HBM)"
            )
        self._tables = [jnp.asarray(t) for t in tables]
        self._maps = [jnp.asarray(np.concatenate(m)) for m in maps]
        self._treedef = treedef
        self._n = n
        self._jit_gather = jax.jit(
            lambda tables, idmaps, i: [t[m[i]]
                                       for t, m in zip(tables, idmaps)])

    def gather(self, idx):
        """Assemble the batch for ``idx`` with one on-device gather."""
        import jax.numpy as jnp

        leaves = self._jit_gather(self._tables, self._maps,
                                  jnp.asarray(np.asarray(idx)))
        return self._treedef.unflatten(leaves)

    def __len__(self):
        return max(1, self._n // self.batch_size)

    def __iter__(self):
        for _ in range(len(self)):
            yield self.gather(self._rng.choice(
                self._n, size=self.batch_size, replace=True, p=self._p))


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
