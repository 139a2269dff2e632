"""Device-resident corpus cache (``train.hdf5_cache_mode="device"``).

TPU-native extension with no reference counterpart: the reference's
fastest loader path (hdf5_cache_mode="all", dataset.py:225-247) still
assembles every batch on the host; the device cache materializes the
preprocessed corpus into HBM once and gathers batches on device
(measured on the 8-task kitchen mixture: host loading 24-28 s/epoch vs
4-6 s of device compute — the loader, not the chip, bounded training).
"""

import numpy as np
import pytest

from lipvq_tpu.config import config_factory
from lipvq_tpu.utils.test_utils import (
    icl_test_config_overrides,
    make_synthetic_dataset,
)


@pytest.fixture(scope="module")
def corpus_pair(tmp_path_factory):
    root = tmp_path_factory.mktemp("device_cache")
    a = make_synthetic_dataset(str(root / "a.hdf5"), n_demos=4, demo_len=30)
    b = make_synthetic_dataset(str(root / "b.hdf5"), n_demos=2, demo_len=60)
    return a, b


def _build(cfg_overrides, data, tmp_path):
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.utils import obs_utils as ObsUtils
    from lipvq_tpu.utils import train_utils as TrainUtils
    from lipvq_tpu.utils.file_utils import get_shape_metadata_from_dataset

    d = icl_test_config_overrides()
    d["train"]["data"] = data
    d["train"]["output_dir"] = str(tmp_path)
    d["train"].update(cfg_overrides)
    cfg = config_factory("icl", d)
    ObsUtils.initialize_obs_utils_with_config(cfg)
    first = data[0]["path"] if isinstance(data, list) else data
    shape_meta = get_shape_metadata_from_dataset(
        first, all_obs_keys=cfg.all_obs_keys
    )
    model = algo_factory(
        "icl", cfg, obs_key_shapes=shape_meta["all_shapes"],
        ac_dim=shape_meta["ac_dim"],
    )
    train_ds, _ = TrainUtils.load_data_for_training(
        cfg, obs_keys=shape_meta["all_obs_keys"]
    )
    return cfg, model, train_ds


def test_device_cache_batches_match_host_path(corpus_pair, tmp_path):
    """A device-gathered batch must be elementwise identical to the
    host path's process_batch_for_training output for the same items."""
    from lipvq_tpu.data.loaders import DeviceCachedLoader
    from lipvq_tpu.utils.tensor_utils import stack_collate

    a, _ = corpus_pair
    cfg, model, ds = _build({"hdf5_cache_mode": "device"}, a, tmp_path)
    loader = DeviceCachedLoader(ds, batch_size=4, model=model, seed=0)
    idx = np.array([0, 3, 7, 11])
    got = loader.gather(idx)
    want = model.process_batch_for_training(
        stack_collate([ds[int(i)] for i in idx])
    )
    import jax

    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    # item-constant leaves (lang_emb: one language per corpus) must
    # deduplicate to a tiny table — the whole point of the row tables
    assert min(len(t) for t in loader._tables) < loader._n


def test_device_cache_trains_and_matches_loss_scale(corpus_pair, tmp_path):
    """run_epoch over the device loader: preprocessed batches are NOT
    re-processed, losses finite, and Time_Data_Loading ~ 0."""
    from lipvq_tpu.utils import train_utils as TrainUtils

    a, _ = corpus_pair
    cfg, model, ds = _build({"hdf5_cache_mode": "device"}, a, tmp_path)
    loader, _, ctx = TrainUtils.make_loaders(cfg, ds, None, model=model)
    assert getattr(loader, "preprocessed", False)
    # the context loader stays a host loader (used once per rollout)
    assert not getattr(ctx, "preprocessed", False)
    log = TrainUtils.run_epoch(model, loader, epoch=1, num_steps=3)
    assert np.isfinite(log["Loss"])


def test_device_cache_preserves_metadataset_weights(corpus_pair, tmp_path):
    """Weighted mixture sampling survives: the loader draws from the
    sampler's per-item probabilities (task-balanced sampling is a
    measured closed-loop lever — BASELINE.md r3f)."""
    from lipvq_tpu.utils import train_utils as TrainUtils

    a, b = corpus_pair
    data = [{"path": a, "weight": 1.0}, {"path": b, "weight": 1.0}]
    cfg, model, ds = _build(
        {"hdf5_cache_mode": "device",
         "normalize_weights_by_ds_size": True},
        data, tmp_path,
    )
    loader, _, _ = TrainUtils.make_loaders(cfg, ds, None, model=model)
    p = loader._p
    assert p is not None and np.isclose(p.sum(), 1.0)
    # balanced mode: each member dataset gets equal TOTAL probability
    n_a = len(ds.datasets[0])
    assert np.isclose(p[:n_a].sum(), 0.5, atol=1e-6)
    # per-epoch draw actually lands in both corpora
    idx = loader._rng.choice(len(ds), size=256, replace=True, p=p)
    assert (idx < n_a).any() and (idx >= n_a).any()


def test_device_cache_train_e2e(corpus_pair, tmp_path):
    """Full train() driver with the device cache mode."""
    import glob
    import os

    from lipvq_tpu.scripts.train import train

    a, b = corpus_pair
    d = icl_test_config_overrides()
    d["train"].update({
        "data": [{"path": a, "weight": 1.0}, {"path": b, "weight": 1.0}],
        "hdf5_cache_mode": "device",
        "output_dir": str(tmp_path),
    })
    cfg = config_factory("icl", d)
    ckpt_dir = train(cfg)
    assert glob.glob(os.path.join(ckpt_dir, "*.ckpt"))


def test_device_cache_rejects_oversized_corpus(corpus_pair, tmp_path):
    from lipvq_tpu.data.loaders import DeviceCachedLoader

    a, _ = corpus_pair
    cfg, model, ds = _build({"hdf5_cache_mode": "device"}, a, tmp_path)
    with pytest.raises(ValueError, match="GB"):
        DeviceCachedLoader(ds, batch_size=4, model=model, max_bytes=1)
