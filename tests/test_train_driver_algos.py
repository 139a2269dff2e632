"""Every major algorithm family runs through the actual train() driver
(the user entry point), not just train_on_batch."""

import glob
import os

import numpy as np
import pytest

from lipvq_tpu.config import config_factory
from lipvq_tpu.robocasa.env_utils import create_env
from lipvq_tpu.scripts.collect_demos import (
    collect_demo,
    scripted_policy,
    write_demos,
)
from lipvq_tpu.scripts.train import train


@pytest.fixture(scope="module")
def demo_corpus(tmp_path_factory):
    env = create_env("SyntheticKitchen", seed=11)
    rng = np.random.default_rng(11)
    trajs = [collect_demo(env, scripted_policy, 30, rng)[0] for _ in range(4)]
    path = str(tmp_path_factory.mktemp("demos") / "demos.hdf5")
    write_demos(path, env, trajs)
    return path


COMMON_EXPERIMENT = {
    "epoch_every_n_steps": 2, "validate": False,
    "rollout": {"enabled": False},
    "save": {"enabled": True, "every_n_epochs": 1},
    "logging": {"terminal_output_to_txt": False, "log_tb": False},
}

CASES = {
    "bc": {"algo": {"gmm": {"enabled": True},
                    "actor_layer_dims": [32, 32]}},
    "act": {"algo": {"act": {"hidden_dim": 32, "ff_dim": 64,
                             "enc_layers": 1, "dec_layers": 1,
                             "chunk_size": 5}}},
    "td3_bc": {"algo": {"actor": {"layer_dims": [32, 32]},
                        "critic": {"layer_dims": [32, 32]}}},
    "iql": {"algo": {"actor": {"layer_dims": [32, 32]},
                     "critic": {"layer_dims": [32, 32]}}},
}


@pytest.mark.parametrize("algo_name", sorted(CASES))
def test_algo_via_train_driver(demo_corpus, tmp_path, algo_name):
    over = {
        "train": {"data": demo_corpus, "batch_size": 4, "seq_length": 5,
                  "output_dir": str(tmp_path / "out"), "num_epochs": 1,
                  "hdf5_load_next_obs": algo_name in ("td3_bc", "iql")},
        "experiment": dict(COMMON_EXPERIMENT),
        "observation": {"modalities": {"obs": {"low_dim": [
            "robot0_eef_pos", "object"]}}},
    }
    over.update(CASES[algo_name])
    cfg = config_factory(algo_name, over)
    ckpt_dir = train(cfg)
    assert glob.glob(os.path.join(ckpt_dir, "*.ckpt")), algo_name
