"""Conversion / data-compat script suite (VERDICT round-1 item 5).

Mirrors reference scripts/conversion/ behaviors over synthetic fixtures:
every tool must transform real HDF5s the training stack can consume.
"""

import json

import h5py
import numpy as np
import pytest

from lipvq_tpu.utils.test_utils import make_synthetic_dataset


@pytest.fixture()
def robomimic_hdf5(tmp_path):
    path = str(tmp_path / "synthetic.hdf5")
    return make_synthetic_dataset(path, n_demos=3, demo_len=20)


def test_extract_action_dict(robomimic_hdf5):
    from lipvq_tpu.scripts.conversion.extract_action_dict import (
        extract_action_dict,
    )

    n = extract_action_dict(robomimic_hdf5)
    assert n >= 3
    with h5py.File(robomimic_hdf5) as f:
        ad = f["data/demo_0/action_dict"]
        acts = np.asarray(f["data/demo_0/actions"])
        np.testing.assert_allclose(ad["rel_pos"], acts[:, :3], atol=1e-6)
        assert ad["rel_rot_6d"].shape[1] == 6
        np.testing.assert_allclose(ad["gripper"], acts[:, 6:7], atol=1e-6)


def test_copy_ds_key(robomimic_hdf5, tmp_path):
    from lipvq_tpu.scripts.conversion.copy_ds_key import copy_ds_keys
    from lipvq_tpu.scripts.conversion.extract_action_dict import (
        extract_action_dict,
    )

    extract_action_dict(robomimic_hdf5)
    target = str(tmp_path / "target.hdf5")
    make_synthetic_dataset(target, n_demos=3, demo_len=20)
    n = copy_ds_keys(robomimic_hdf5, target, ["action_dict", "actions"])
    assert n == 6
    with h5py.File(target) as f:
        assert "rel_rot_6d" in f["data/demo_1/action_dict"]


def test_set_attr_and_remove_mg(robomimic_hdf5):
    from lipvq_tpu.scripts.conversion.remove_mg_env_label import (
        remove_mg_label,
    )
    from lipvq_tpu.scripts.conversion.set_dataset_attr import set_attr

    set_attr(robomimic_hdf5, "env_args.env_name", "MG_OpenDrawer")
    with h5py.File(robomimic_hdf5) as f:
        assert json.loads(f["data"].attrs["env_args"])["env_name"] == (
            "MG_OpenDrawer"
        )
    assert remove_mg_label(robomimic_hdf5) == "OpenDrawer"


def test_convert_robosuite(tmp_path):
    from lipvq_tpu.scripts.conversion.convert_robosuite import (
        convert_robosuite,
    )

    raw = str(tmp_path / "raw.hdf5")
    with h5py.File(raw, "w") as f:
        data = f.create_group("data")
        data.attrs["env"] = "OpenDrawer"
        g = data.create_group("demo_0")
        g.create_dataset("actions", data=np.zeros((10, 12), np.float32))
    env_args = convert_robosuite(raw)
    assert env_args["env_name"] == "OpenDrawer"
    with h5py.File(raw) as f:
        assert f["data/demo_0"].attrs["num_samples"] == 10
        assert "all" in f["mask"]


def test_convert_d4rl(tmp_path):
    from lipvq_tpu.scripts.conversion.convert_d4rl import convert_d4rl

    buf = str(tmp_path / "buffer.npz")
    n = 50
    terminals = np.zeros(n)
    terminals[19] = 1
    terminals[39] = 1
    np.savez(
        buf,
        observations=np.random.randn(n, 11).astype(np.float32),
        actions=np.random.randn(n, 3).astype(np.float32),
        rewards=np.random.randn(n).astype(np.float32),
        terminals=terminals,
    )
    out = str(tmp_path / "converted.hdf5")
    demos = convert_d4rl(buf, "Walker2d-v3", out)
    assert demos == 3
    with h5py.File(out) as f:
        assert json.loads(f["data"].attrs["env_args"])["env_name"] == (
            "Walker2d-v3"
        )
        assert f["data/demo_0"].attrs["num_samples"] == 20
        assert f["data/demo_0/obs/flat"].shape == (20, 11)
        assert f["data/demo_0/next_obs/flat"].shape == (20, 11)


def test_convert_r2d2(tmp_path):
    from lipvq_tpu.scripts.conversion.convert_r2d2 import convert_r2d2

    raw = str(tmp_path / "droid.h5")
    n = 30
    with h5py.File(raw, "w") as f:
        rs = f.create_group("observation").create_group("robot_state")
        rs.create_dataset("cartesian_position",
                          data=np.random.randn(n, 6).astype(np.float32))
        rs.create_dataset("gripper_position",
                          data=np.random.rand(n).astype(np.float32))
        rs.create_dataset("joint_positions",
                          data=np.random.randn(n, 7).astype(np.float32))
        act = f.create_group("action")
        act.create_dataset("cartesian_velocity",
                           data=np.random.randn(n, 6).astype(np.float32))
        act.create_dataset("gripper_position",
                           data=np.random.rand(n).astype(np.float32))
    out = str(tmp_path / "droid_converted.hdf5")
    assert convert_r2d2(raw, out, lang="pick up the cup") == 1
    with h5py.File(out) as f:
        d = f["data/demo_0"]
        assert d["actions"].shape == (n, 7)
        assert d["obs/robot0_eef_pos"].shape == (n, 3)
        assert d["obs/robot0_joint_positions"].shape == (n, 7)
        assert "rel_rot_6d" in d["action_dict"]
        assert json.loads(d.attrs["ep_meta"])["lang"] == "pick up the cup"


@pytest.mark.skipif(
    pytest.importorskip("mujoco") is None, reason="mujoco required"
)
def test_add_absolute_actions_kitchen(tmp_path):
    """Replay-based absolute actions over a real kitchen demo."""
    from lipvq_tpu.robocasa.env_utils import create_env
    from lipvq_tpu.robocasa.sim.scripted import make_scripted_policy
    from lipvq_tpu.scripts.collect_demos import collect_demo, write_demos
    from lipvq_tpu.scripts.conversion.robosuite_add_absolute_actions import (
        add_absolute_actions,
    )

    env = create_env("CloseDrawer", seed=3)
    rng = np.random.default_rng(0)
    traj, success = collect_demo(
        env, None, 500, rng,
        policy_factory=lambda e: make_scripted_policy("CloseDrawer", e),
    )
    assert success
    traj["ep_meta"] = env.get_ep_meta()
    path = str(tmp_path / "kitchen.hdf5")
    write_demos(path, env, [traj])
    env.close()

    assert add_absolute_actions(path) == 1
    with h5py.File(path) as f:
        abs_a = np.asarray(f["data/demo_0/actions_abs"])
        rel_a = np.asarray(f["data/demo_0/actions"])
        assert abs_a.shape == rel_a.shape
        # gripper + mode channels pass through unchanged
        np.testing.assert_allclose(abs_a[:, 6], np.clip(rel_a[:, 6], -1, 1))
        np.testing.assert_allclose(abs_a[:, 11], np.clip(rel_a[:, 11], -1, 1))
        assert np.isfinite(abs_a).all()


def test_generate_paper_configs(tmp_path):
    from lipvq_tpu.scripts.generate_paper_configs import (
        generate_paper_configs,
    )

    paths = generate_paper_configs(str(tmp_path), tasks=["OpenDrawer"])
    assert len(paths) > 15
    with open(paths[0]) as f:
        d = json.load(f)
    assert "train" in d and "algo" in d
    assert (tmp_path / "run_all.sh").exists()


def test_hyperparam_helper(tmp_path):
    import shutil

    from lipvq_tpu.scripts.hyperparam_helper import main as hh_main

    base = "exps/templates/icl_transformer.json"
    dst = str(tmp_path / "base.json")
    shutil.copyfile(base, dst)
    paths = hh_main(["--config", dst, "--script", str(tmp_path / "run.sh")])
    assert len(paths) == 8  # 2 lr x 2 gmm x 2 width
