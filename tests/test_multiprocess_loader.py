"""MultiprocessLoader parity with the single-thread DataLoader.

The reference image protocol uses 5 torch DataLoader worker processes
(config_gen_utils.py:232-238); MultiprocessLoader is the counterpart.
Batches may arrive in completion order, but the multiset of sampled
indices per epoch must match the seeded permutation, and every batch
must be well-formed.
"""

import numpy as np
import pytest


class _ToyDataset:
    """Picklable index-echo dataset (no HDF5 needed for the loader
    contract)."""

    def __init__(self, n=64, dim=5):
        self.n = n
        self.dim = dim

    def close(self):
        pass

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "index": np.array([i], dtype=np.int64),
            "x": np.full((self.dim,), float(i), dtype=np.float32),
        }


def test_multiprocess_loader_covers_epoch():
    from lipvq_tpu.data.loaders import MultiprocessLoader

    ds = _ToyDataset(n=64)
    loader = MultiprocessLoader(ds, batch_size=8, shuffle=True, seed=3,
                                num_workers=2)
    try:
        batches = list(iter(loader))
        assert len(batches) == 8
        seen = np.sort(np.concatenate([b["index"][:, 0] for b in batches]))
        assert (seen == np.arange(64)).all()
        for b in batches:
            assert b["x"].shape == (8, 5)
            assert (b["x"][:, 0] == b["index"][:, 0]).all()
        # second epoch uses a fresh permutation and still covers all
        batches2 = list(iter(loader))
        assert len(batches2) == 8
    finally:
        loader.shutdown()


def test_multiprocess_loader_hdf5_dataset(tmp_path):
    """End-to-end over a real SequenceDataset: forked workers must
    reopen their own h5py handles."""
    import json

    import h5py

    from lipvq_tpu.data.dataset import SequenceDataset
    from lipvq_tpu.data.loaders import DataLoader, MultiprocessLoader
    from lipvq_tpu.utils import obs_utils as ObsUtils

    path = str(tmp_path / "toy.hdf5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "Toy", "type": 1, "env_kwargs": {}}
        )
        for d in range(4):
            g = data.create_group(f"demo_{d}")
            g.attrs["num_samples"] = 12
            g.attrs["ep_meta"] = json.dumps({"lang": "toy"})
            g.create_group("obs").create_dataset(
                "eef", data=rng.standard_normal((12, 3)).astype(np.float32)
            )
            g.create_dataset(
                "actions",
                data=rng.standard_normal((12, 12)).astype(np.float32),
            )

    ObsUtils.register_obs_keys({"eef": "low_dim"})

    def build():
        return SequenceDataset(
            hdf5_path=path, obs_keys=("eef",), dataset_keys=("actions",),
            frame_stack=1, seq_length=5, pad_frame_stack=True,
            pad_seq_length=True, hdf5_cache_mode=None,
        )

    ds = build()
    mp_loader = MultiprocessLoader(ds, batch_size=4, shuffle=False,
                                   num_workers=2)
    try:
        mp_batches = list(iter(mp_loader))
    finally:
        mp_loader.shutdown()
    st_batches = list(
        iter(DataLoader(build(), batch_size=4, shuffle=False))
    )
    assert len(mp_batches) == len(st_batches)
    # completion order may differ: compare as index-keyed sets
    def keyed(batches):
        out = {}
        for b in batches:
            for row in range(b["actions"].shape[0]):
                out[int(b["index"][row])] = b["actions"][row]
        return out

    a, b = keyed(mp_batches), keyed(st_batches)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k])
