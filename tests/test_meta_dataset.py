"""MetaDataset mixing + weighted sampling + MSE observability tests."""

import numpy as np
import pytest

from lipvq_tpu.data.dataset import MetaDataset, SequenceDataset
from lipvq_tpu.utils.test_utils import make_synthetic_dataset


@pytest.fixture
def two_datasets(tmp_path):
    p1 = make_synthetic_dataset(str(tmp_path / "a.hdf5"), n_demos=4,
                                demo_len=20, seed=1)
    p2 = make_synthetic_dataset(str(tmp_path / "b.hdf5"), n_demos=2,
                                demo_len=30, seed=2)
    mk = lambda p: SequenceDataset(
        p, obs_keys=["object"], dataset_keys=["actions"],
        action_config={"actions": {"normalization": "min_max"}},
        frame_stack=1, seq_length=5, hdf5_cache_mode="low_dim",
    )
    return mk(p1), mk(p2)


def test_meta_dataset_indexing(two_datasets):
    ds1, ds2 = two_datasets
    meta = MetaDataset([ds1, ds2])
    assert len(meta) == len(ds1) + len(ds2)
    item0 = meta[0]
    assert item0["ds_id"] == 0
    item_last = meta[len(meta) - 1]
    assert item_last["ds_id"] == 1
    assert item0["actions"].shape == (5, 12)


def test_meta_dataset_shared_stats(two_datasets):
    ds1, ds2 = two_datasets
    meta = MetaDataset([ds1, ds2])
    s1 = ds1.get_action_normalization_stats()
    s2 = ds2.get_action_normalization_stats()
    np.testing.assert_array_equal(
        s1["actions"]["scale"], s2["actions"]["scale"]
    )
    np.testing.assert_array_equal(
        s1["actions"]["scale"],
        meta.get_action_normalization_stats()["actions"]["scale"],
    )


def test_weighted_sampler(two_datasets):
    ds1, ds2 = two_datasets
    meta = MetaDataset([ds1, ds2], ds_weights=[1.0, 3.0])
    sampler = meta.get_dataset_sampler(num_samples=4000, seed=0)
    counts = [0, 0]
    boundary = len(ds1)
    for i in sampler:
        counts[0 if i < boundary else 1] += 1
    # ds2 has 60 seqs weighted 3x vs ds1 80 seqs weighted 1x:
    # expected ratio 180:80
    ratio = counts[1] / max(counts[0], 1)
    assert 1.6 < ratio < 3.0, counts
    # uniform weights -> no sampler
    assert MetaDataset([ds1, ds2]).get_dataset_sampler() is None


def test_task_balanced_sampler(two_datasets):
    """normalize_weights_by_ds_size=True -> equal per-DATASET probability
    even with unit weights (reference dataset.py:1069-1078); measured 10x
    per-task timestep imbalance in the kitchen suite corpora motivates it."""
    ds1, ds2 = two_datasets
    meta = MetaDataset([ds1, ds2], normalize_weights_by_ds_size=True)
    sampler = meta.get_dataset_sampler(num_samples=4000, seed=0)
    assert sampler is not None  # unit weights still need the sampler
    counts = [0, 0]
    boundary = len(ds1)
    for i in sampler:
        counts[0 if i < boundary else 1] += 1
    # ds1 has 80 seqs, ds2 60: balanced mode should sample ~50/50
    ratio = counts[1] / max(counts[0], 1)
    assert 0.85 < ratio < 1.18, counts


def test_mse_metrics():
    from lipvq_tpu.utils.vis_utils import compute_mse_metrics

    pred = np.zeros((10, 3))
    true = np.full((10, 3), 0.005)
    m = compute_mse_metrics(pred, true)
    assert m["action_mse"] == pytest.approx(2.5e-5)
    assert m["action_accuracy@0.001"] == 1.0
    assert m["action_accuracy@1e-05"] == 0.0
