"""Full user workflow: train -> checkpoint -> eval-config generation ->
train --eval_only closed-loop rollout (the reference eval_ckpt flow,
SURVEY.md §3.2/§3.4) — on the synthetic env."""

import glob
import json
import os

import numpy as np
import pytest

from lipvq_tpu.config import config_factory
from lipvq_tpu.utils.test_utils import icl_test_config_overrides


@pytest.mark.slow
def test_train_then_eval_ckpt_flow(tmp_path):
    from lipvq_tpu.scripts.train import train

    # 1. collect a synthetic demo corpus (real obs from the env so the
    # eval env's observations match training)
    from lipvq_tpu.robocasa.env_utils import create_env
    from lipvq_tpu.scripts.collect_demos import (
        collect_demo, scripted_policy, write_demos,
    )

    env = create_env("SyntheticKitchen", seed=0)
    rng = np.random.default_rng(0)
    trajs = [collect_demo(env, scripted_policy, 40, rng)[0] for _ in range(5)]
    data_path = str(tmp_path / "demos.hdf5")
    write_demos(data_path, env, trajs)

    # 2. short training run with rollout enabled
    d = icl_test_config_overrides()
    d["train"]["data"] = data_path
    d["train"]["output_dir"] = str(tmp_path / "out")
    d["experiment"]["rollout"] = {
        "enabled": True, "n": 1, "horizon": 10, "rate": 1, "warmstart": 0,
        "terminate_on_success": True,
    }
    d["experiment"]["render_video"] = False
    d["observation"]["modalities"]["obs"]["low_dim"] = [
        "robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos",
        "object", "lang_emb",
    ]
    cfg = config_factory("icl", d)
    ckpt_dir = train(cfg)
    ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "model_epoch_*.ckpt")))
    assert ckpts, "training saved no checkpoint"

    # 3. eval-config generation (the eval_ckpt CLI flow)
    from lipvq_tpu.scripts.config_gen import eval_ckpt

    out_dir = str(tmp_path / "evalcfg")
    import sys

    argv = sys.argv
    sys.argv = [
        "eval_ckpt", "--ckpt", ckpts[-1], "--name", "evalrun",
        "--n_rollouts", "1", "--horizon", "8", "--output_dir", out_dir,
    ]
    try:
        eval_ckpt.main()
    finally:
        sys.argv = argv
    eval_cfg_path = os.path.join(out_dir, "configs", "evalrun_eval.json")
    assert os.path.exists(eval_cfg_path)

    # 4. eval-only run: loads ckpt, runs only the rollout branch
    with open(eval_cfg_path) as f:
        eval_cfg_raw = json.load(f)
    eval_cfg_raw["train"]["output_dir"] = str(tmp_path / "evalout")
    algo_name = eval_cfg_raw.pop("algo_name")
    eval_cfg = config_factory(algo_name, eval_cfg_raw)
    train_fn_dir = train(eval_cfg, eval_only=True)
    assert os.path.isdir(train_fn_dir)
