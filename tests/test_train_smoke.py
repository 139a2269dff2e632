"""End-to-end smoke training (reference test strategy, SURVEY.md §4.1):
tiny config, a few gradient steps over a synthetic robomimic HDF5, save
checkpoint, reload, act — assert no exception and sane outputs."""

import glob
import os

import numpy as np
import pytest

from lipvq_tpu.config import config_factory
from lipvq_tpu.utils.test_utils import icl_test_config_overrides, make_synthetic_dataset


@pytest.fixture(scope="module")
def synthetic_hdf5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "synthetic.hdf5")
    return make_synthetic_dataset(path, n_demos=6, demo_len=30)


def _make_config(dataset_path, tmpdir, **algo_overrides):
    d = icl_test_config_overrides()
    d["train"]["data"] = dataset_path
    d["train"]["output_dir"] = str(tmpdir)
    for k, v in algo_overrides.items():
        d["algo"]["transformer"][k] = v
    return config_factory("icl", d)


def test_icl_vq_end_to_end(synthetic_hdf5, tmp_path):
    from lipvq_tpu.scripts.train import train

    cfg = _make_config(synthetic_hdf5, tmp_path)
    ckpt_dir = train(cfg)
    ckpts = glob.glob(os.path.join(ckpt_dir, "*.ckpt"))
    assert ckpts, "expected a saved checkpoint"

    # reload + act (reference test_eval_agent_from_checkpoint)
    from lipvq_tpu.utils.file_utils import policy_from_checkpoint

    model, ckpt = policy_from_checkpoint(ckpts[0])
    t = model.context_length
    obs = {
        k: np.zeros((1, t) + tuple(s), np.float32)
        for k, s in model.obs_shapes.items()
    }
    ctx = {"obs": obs, "actions": np.zeros((1, t, model.ac_dim), np.float32)}
    a = model.get_action(obs, ctx)
    assert a.shape == (1, model.ac_dim)
    assert np.isfinite(a).all()
    stats = ckpt["action_normalization_stats_unpacked"]
    assert stats is not None and "actions" in stats


@pytest.mark.parametrize(
    "switches",
    [
        {"vq_vae_enabled": False, "bin_enabled": True, "ln_act_enabled": False},
        {"vq_vae_enabled": False, "bin_enabled": False, "ln_act_enabled": True},
        {"vq_vae_enabled": False, "bin_enabled": False, "ln_act_enabled": False},
        {"vq_vae_enabled": False, "bin_enabled": False,
         "ln_act_enabled": False, "fast_enabled": True},
    ],
    ids=["bin", "ln_act", "raw", "fast"],
)
def test_icl_tokenizer_switches_train(synthetic_hdf5, tmp_path, switches):
    """Every tokenizer switch must train a few steps without error
    (the reference has NO tests for these paths — SURVEY.md §4.1)."""
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.utils import obs_utils as ObsUtils
    from lipvq_tpu.utils import train_utils as TrainUtils
    from lipvq_tpu.utils.file_utils import get_shape_metadata_from_dataset

    cfg = _make_config(synthetic_hdf5, tmp_path, **switches)
    ObsUtils.initialize_obs_utils_with_config(cfg)
    shape_meta = get_shape_metadata_from_dataset(
        synthetic_hdf5, all_obs_keys=cfg.all_obs_keys
    )
    model = algo_factory(
        "icl", cfg, obs_key_shapes=shape_meta["all_shapes"],
        ac_dim=shape_meta["ac_dim"],
    )
    train_ds, _ = TrainUtils.load_data_for_training(
        cfg, obs_keys=shape_meta["all_obs_keys"]
    )
    loader, _, _ = TrainUtils.make_loaders(cfg, train_ds, None)
    log = TrainUtils.run_epoch(model, loader, epoch=1, num_steps=2)
    assert np.isfinite(log["Loss"])


def test_icl_fast_end_to_end(synthetic_hdf5, tmp_path):
    """FAST trained through the full ICL composite (VERDICT r3 weak #7):
    train() with fast_enabled, then reload the checkpoint — the fitted
    DCT+BPE tokenizer must ride along (FASTCKPT payload) and get_action
    must consume a RAW-action context by converting it to token
    features (reference obs_nets.py:1306-1334 forward path)."""
    from lipvq_tpu.scripts.train import train
    from lipvq_tpu.utils.file_utils import policy_from_checkpoint

    cfg = _make_config(
        synthetic_hdf5, tmp_path,
        vq_vae_enabled=False, bin_enabled=False, ln_act_enabled=False,
        fast_enabled=True,
    )
    ckpt_dir = train(cfg)
    ckpts = glob.glob(os.path.join(ckpt_dir, "*.ckpt"))
    assert ckpts

    model, _ = policy_from_checkpoint(ckpts[0])
    assert model._fast_tok is not None, "FAST tokenizer not restored"
    assert model._fast_tok.lo is not None
    t = model.context_length
    obs = {
        k: np.zeros((1, t) + tuple(s), np.float32)
        for k, s in model.obs_shapes.items()
    }
    ctx = {"obs": obs,
           "actions": np.zeros((1, t, model.ac_dim), np.float32)}
    a = model.get_action(obs, ctx)
    assert a.shape == (1, model.ac_dim)
    assert np.isfinite(a).all()


def test_icl_mamba_smoke(synthetic_hdf5, tmp_path):
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.utils import obs_utils as ObsUtils
    from lipvq_tpu.utils import train_utils as TrainUtils
    from lipvq_tpu.utils.file_utils import get_shape_metadata_from_dataset

    d = icl_test_config_overrides()
    d["train"]["data"] = synthetic_hdf5
    d["train"]["output_dir"] = str(tmp_path)
    tf = d["algo"].pop("transformer")
    tf["d_state"] = 8
    tf["d_conv"] = 4
    tf["expand"] = 2
    d["algo"]["mamba"] = tf
    cfg = config_factory("icl_mamba", d)
    ObsUtils.initialize_obs_utils_with_config(cfg)
    shape_meta = get_shape_metadata_from_dataset(
        synthetic_hdf5, all_obs_keys=cfg.all_obs_keys
    )
    model = algo_factory(
        "icl_mamba", cfg, obs_key_shapes=shape_meta["all_shapes"],
        ac_dim=shape_meta["ac_dim"],
    )
    train_ds, _ = TrainUtils.load_data_for_training(
        cfg, obs_keys=shape_meta["all_obs_keys"]
    )
    loader, _, _ = TrainUtils.make_loaders(cfg, train_ds, None)
    log = TrainUtils.run_epoch(model, loader, epoch=1, num_steps=2)
    assert np.isfinite(log["Loss"])


def test_dataset_windowing(synthetic_hdf5):
    """Window/pad semantics per reference dataset.py:588-632."""
    from lipvq_tpu.data.dataset import SequenceDataset

    ds = SequenceDataset(
        synthetic_hdf5,
        obs_keys=["robot0_eef_pos", "object", "lang_emb"],
        dataset_keys=["actions"],
        frame_stack=10, seq_length=10,
        pad_frame_stack=True, pad_seq_length=True,
        hdf5_cache_mode="all",
    )
    # each demo has demo_len sequences when both paddings on
    assert len(ds) == 6 * 30
    item = ds[0]
    t = 10 - 1 + 10
    assert item["actions"].shape == (t, 12)
    assert item["obs"]["robot0_eef_pos"].shape == (t, 3)
    assert item["obs"]["lang_emb"].shape == (t, 768)
    # first item: frame-stack padding repeats the first frame
    np.testing.assert_array_equal(
        item["obs"]["object"][0], item["obs"]["object"][8]
    )
    # last item of first demo: seq padding repeats the final frame
    item_last = ds[29]
    np.testing.assert_array_equal(
        item_last["obs"]["object"][-1], item_last["obs"]["object"][9]
    )
    # actions are min-max-free by default (no normalization configured)
    stats = ds.get_action_normalization_stats()
    np.testing.assert_array_equal(stats["actions"]["scale"], np.ones(12))


def test_action_minmax_normalization(synthetic_hdf5):
    from lipvq_tpu.data.dataset import SequenceDataset

    ds = SequenceDataset(
        synthetic_hdf5,
        obs_keys=["object"],
        dataset_keys=["actions"],
        action_config={"actions": {"normalization": "min_max"}},
        frame_stack=1, seq_length=5,
        hdf5_cache_mode="all",
    )
    mins, maxs = None, None
    for i in range(0, len(ds), 7):
        a = ds[i]["actions"]
        mins = a.min(0) if mins is None else np.minimum(mins, a.min(0))
        maxs = a.max(0) if maxs is None else np.maximum(maxs, a.max(0))
    assert (mins >= -1.0 - 1e-5).all() and (maxs <= 1.0 + 1e-5).all()
    assert maxs.max() > 0.9  # actually uses the range
