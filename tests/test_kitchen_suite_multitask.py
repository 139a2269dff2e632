"""Kitchen suite collection + multi-task ICL training.

The paper trains multi-task ICL over the robocasa task suite
(icl_xfmr_gen.py: get_robocasa_ds over many tasks -> MetaDataset).
This pins the same flow on generated expert corpora: collect two task
datasets, train one ICL model over the weighted mixture, reload.
"""

import glob
import json
import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from lipvq_tpu.config import config_factory  # noqa: E402
from lipvq_tpu.utils.test_utils import icl_test_config_overrides  # noqa: E402


@pytest.fixture(scope="module")
def suite_dir(tmp_path_factory):
    from lipvq_tpu.scripts.collect_kitchen_suite import collect_task

    out = tmp_path_factory.mktemp("suite")
    # drawer tasks keep a fixed 2-object scene -> consistent obs keys
    for task, seed in (("OpenDrawer", 3), ("CloseDrawer", 5)):
        stats = collect_task(
            task, str(out / f"{task}.hdf5"), n_demos=4, max_steps=300,
            seed=seed,
        )
        assert stats["demos"] == 4, stats
    return out


def test_suite_manifest_and_action_dict(suite_dir):
    import h5py

    with h5py.File(str(suite_dir / "OpenDrawer.hdf5")) as f:
        demo = f["data/demo_0"]
        assert "action_dict" in demo
        assert "rel_rot_6d" in demo["action_dict"]
        lang = json.loads(demo.attrs["ep_meta"])["lang"]
        assert "drawer" in lang


def test_multitask_icl_training(suite_dir, tmp_path):
    from lipvq_tpu.scripts.train import train
    from lipvq_tpu.utils.file_utils import policy_from_checkpoint

    d = icl_test_config_overrides()
    d["train"]["data"] = [
        {"path": str(suite_dir / "OpenDrawer.hdf5"), "weight": 1.0},
        {"path": str(suite_dir / "CloseDrawer.hdf5"), "weight": 1.0},
    ]
    # MetaDataset rejects hdf5_cache_mode="all" (enforced reference
    # quirk, dataset.py:1080-1082)
    d["train"]["hdf5_cache_mode"] = "low_dim"
    d["train"]["output_dir"] = str(tmp_path)
    cfg = config_factory("icl", d)
    ckpt_dir = train(cfg)
    ckpts = glob.glob(os.path.join(ckpt_dir, "*.ckpt"))
    assert ckpts

    model, ckpt = policy_from_checkpoint(ckpts[0])
    t = model.context_length
    obs = {
        k: np.zeros((1, t) + tuple(s), np.float32)
        for k, s in model.obs_shapes.items()
    }
    ctx = {"obs": obs, "actions": np.zeros((1, t, model.ac_dim), np.float32)}
    a = model.get_action(obs, ctx)
    assert np.isfinite(np.asarray(a)).all()
