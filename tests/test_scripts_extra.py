"""Tests for the sweep / zero-shot-eval / next_obs-collection scripts."""

import json
import os
import sys

import h5py
import numpy as np

from lipvq_tpu.utils.test_utils import make_synthetic_dataset


def test_tokenizer_sweep_small(tmp_path):
    from lipvq_tpu.scripts.tokenizer_sweep import load_corpus, train_tokenizer

    path = make_synthetic_dataset(str(tmp_path / "d.hdf5"), n_demos=6,
                                  demo_len=30)
    corpus = load_corpus(path)
    assert corpus.shape == (180, 12)
    for ema in (False, True):
        r = train_tokenizer(corpus, num_codes=32, ema=ema, latent_dim=16,
                            steps=20, batch=64)
        assert np.isfinite(r["final_train_loss"])
        assert 0 <= r["codebook_utilization"] <= 1
        assert r["codebook_update"] == ("ema" if ema else "loss")


def test_collect_demos_writes_next_obs(tmp_path):
    from lipvq_tpu.robocasa.env_utils import create_env
    from lipvq_tpu.scripts.collect_demos import (
        collect_demo, scripted_policy, write_demos,
    )

    env = create_env("SyntheticKitchen", seed=1)
    rng = np.random.default_rng(1)
    trajs = [collect_demo(env, scripted_policy, 30, rng)[0] for _ in range(2)]
    path = str(tmp_path / "demos.hdf5")
    write_demos(path, env, trajs)
    with h5py.File(path, "r") as f:
        obs = np.asarray(f["data/demo_0/obs/robot0_eef_pos"])
        nobs = np.asarray(f["data/demo_0/next_obs/robot0_eef_pos"])
        np.testing.assert_array_equal(nobs[:-1], obs[1:])
        np.testing.assert_array_equal(nobs[-1], obs[-1])

    # offline RL trains directly on the collected corpus
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.data.dataset import SequenceDataset

    cfg = config_factory("td3_bc", {"train": {"batch_size": 4}})
    obs_keys = ["robot0_eef_pos", "object"]
    with cfg.unlocked():
        cfg.observation.modalities.obs.low_dim = obs_keys
    model = algo_factory(
        "td3_bc", cfg,
        {"robot0_eef_pos": [3], "object": [14]}, ac_dim=12,
    )
    ds = SequenceDataset(
        path, obs_keys=obs_keys, dataset_keys=["actions", "rewards", "dones"],
        frame_stack=1, seq_length=2, load_next_obs=True,
    )
    from lipvq_tpu.data.loaders import DataLoader

    batch = next(iter(DataLoader(ds, batch_size=4, shuffle=True)))
    pb = model.process_batch_for_training(batch)
    info = model.train_on_batch(pb, epoch=0)
    assert np.isfinite(float(info["losses"]["action_loss"]))


def test_eval_zr_ckpt_generator(tmp_path):
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.scripts.config_gen import eval_zr_ckpt
    from lipvq_tpu.utils.file_utils import save_checkpoint
    from lipvq_tpu.utils.test_utils import icl_test_config_overrides

    cfg = config_factory("icl", icl_test_config_overrides())
    obs_key_shapes = {"robot0_eef_pos": [3], "object": [14]}
    with cfg.unlocked():
        cfg.observation.modalities.obs.low_dim = list(obs_key_shapes)
    model = algo_factory("icl", cfg, obs_key_shapes, ac_dim=12)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, model, cfg, shape_meta={
        "all_shapes": obs_key_shapes, "all_obs_keys": list(obs_key_shapes),
        "ac_dim": 12,
    })
    argv = sys.argv
    sys.argv = ["zr", "--ckpt", ckpt, "--name", "zr", "--task", "OpenDrawer",
                "--output_dir", str(tmp_path)]
    try:
        eval_zr_ckpt.main()
    finally:
        sys.argv = argv
    out = os.path.join(str(tmp_path), "configs", "zr_zr.json")
    with open(out) as f:
        c = json.load(f)
    assert c["experiment"]["env"] == "OpenDrawer"
    assert c["experiment"]["rollout"]["horizon"] == 500
    assert c["train"]["num_epochs"] == 0


def test_import_torch_ckpt_cli(tmp_path):
    """Full CLI path: torch.save payload -> converted msgpack."""
    import torch

    from tests.test_torch_import import _build_torch_lipvq

    tm = _build_torch_lipvq(feature_dim=12, latent_dim=32, num_codes=16)
    ckpt = str(tmp_path / "ref.pth")
    torch.save({"model": tm.state_dict()}, ckpt)

    from lipvq_tpu.scripts import import_torch_ckpt as cli

    argv = sys.argv
    out = str(tmp_path / "params.msgpack")
    sys.argv = ["imp", "--torch_ckpt", ckpt, "--output", out,
                "--component", "lipvq"]
    try:
        cli.main()
    finally:
        sys.argv = argv

    # converted params drive the JAX tokenizer with bit-identical ids
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE

    with open(out, "rb") as f:
        params = serialization.msgpack_restore(f.read())["params"]
    model = LipVQVAE(12, 32, num_codes=16)
    x = np.random.default_rng(0).standard_normal((64, 12)).astype(np.float32)
    ids = np.asarray(
        model.apply({"params": params}, jnp.asarray(x),
                    method=LipVQVAE.tokenize)
    )
    with torch.no_grad():
        _, ids_t, _ = tm(torch.from_numpy(x.copy()))
    np.testing.assert_array_equal(ids, ids_t.numpy())


def test_hbc_trains_via_train_loop(tmp_path):
    """HBC (planner+actor) end-to-end through the train() driver on a
    collected corpus with next_obs."""
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.robocasa.env_utils import create_env
    from lipvq_tpu.scripts.collect_demos import (
        collect_demo, scripted_policy, write_demos,
    )
    from lipvq_tpu.scripts.train import train

    env = create_env("SyntheticKitchen", seed=7)
    rng = np.random.default_rng(7)
    trajs = [collect_demo(env, scripted_policy, 25, rng)[0] for _ in range(4)]
    data = str(tmp_path / "demos.hdf5")
    write_demos(data, env, trajs)

    cfg = config_factory("hbc", {
        "train": {"data": data, "batch_size": 6, "seq_length": 10,
                  "output_dir": str(tmp_path / "out"),
                  "hdf5_load_next_obs": True},
        "experiment": {
            "epoch_every_n_steps": 2, "validate": False,
            "rollout": {"enabled": False},
            "save": {"enabled": True, "every_n_epochs": 1},
            "logging": {"terminal_output_to_txt": False, "log_tb": False},
        },
        "algo": {
            "planner": {"subgoal_horizon": 5,
                        "ae": {"planner_layer_dims": [32, 32]}},
            "actor": {"actor_layer_dims": [32, 32]},
        },
        "observation": {"modalities": {"obs": {"low_dim": [
            "robot0_eef_pos", "object"]}}},
    })
    with cfg.unlocked():
        cfg.train.num_epochs = 1
    ckpt_dir = train(cfg)
    assert os.path.isdir(ckpt_dir)


def test_diffusion_trains_via_train_loop(tmp_path):
    """Diffusion Policy end-to-end through the train() driver."""
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.robocasa.env_utils import create_env
    from lipvq_tpu.scripts.collect_demos import (
        collect_demo, scripted_policy, write_demos,
    )
    from lipvq_tpu.scripts.train import train

    env = create_env("SyntheticKitchen", seed=9)
    rng = np.random.default_rng(9)
    trajs = [collect_demo(env, scripted_policy, 30, rng)[0] for _ in range(4)]
    data = str(tmp_path / "demos.hdf5")
    write_demos(data, env, trajs)

    cfg = config_factory("diffusion_policy", {
        "train": {"data": data, "batch_size": 4, "seq_length": 16,
                  "frame_stack": 2, "output_dir": str(tmp_path / "out"),
                  "num_epochs": 1},
        "experiment": {
            "epoch_every_n_steps": 2, "validate": False,
            "rollout": {"enabled": False},
            "save": {"enabled": True, "every_n_epochs": 1},
            "logging": {"terminal_output_to_txt": False, "log_tb": False},
        },
        "algo": {"unet": {"down_dims": [16, 32]},
                 "ddpm": {"num_train_timesteps": 5,
                          "num_inference_timesteps": 5}},
        "observation": {"modalities": {"obs": {"low_dim": [
            "robot0_eef_pos", "object"]}}},
    })
    ckpt_dir = train(cfg)
    import glob as _glob

    assert _glob.glob(os.path.join(ckpt_dir, "*.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "latest_full.state"))


def test_collect_dwell_and_coverage(tmp_path):
    """Dwell injection + coverage sidecar (round 4): collect_task with
    dwell_prob holds position on random spans while recording clean
    progress labels, and writes <corpus>.coverage.json with per-attempt
    init records + summary."""
    import json

    from lipvq_tpu.scripts.collect_kitchen_suite import collect_task

    path = str(tmp_path / "TurnOnSinkFaucet.hdf5")
    stats = collect_task(
        "TurnOnSinkFaucet", path, n_demos=2, max_steps=400, seed=3,
        layout_ids=0, style_ids=0, action_noise=0.05, dwell_prob=0.3,
        with_action_dict=False,
    )
    assert stats["demos"] == 2
    cov = json.load(open(str(tmp_path / "TurnOnSinkFaucet.coverage.json")))
    assert cov["summary"]["attempts"] >= 2
    assert cov["summary"]["successes"] == 2
    assert "per_lang" in cov["summary"]
    rec = cov["attempts"][0]
    assert {"success", "layout", "style", "lang"} <= set(rec)
    assert isinstance(rec.get("objects"), dict)
    # dwell spans repeat the held label verbatim in consecutive steps
    import h5py
    import numpy as np

    with h5py.File(path) as f:
        acts = np.asarray(f["data/demo_0/actions"])
    rep = (np.abs(np.diff(acts, axis=0)).sum(axis=1) == 0).sum()
    assert rep >= 1, "expected repeated labels from dwell spans"
