"""Multi-device data-parallel training through the PRODUCT path
(VERDICT.md round-1 item 2).

The suite runs on a spoofed 8-device CPU platform (conftest), so these
tests exercise real pjit sharding: ``train.num_devices`` in the config
makes ``scripts/train.py`` attach a mesh, replicate state, and shard
every batch — the same ``Algo.attach_mesh`` path ``dryrun_multichip``
calls.
"""

import glob
import os

import jax
import numpy as np
import pytest

from lipvq_tpu.config import config_factory
from lipvq_tpu.utils.test_utils import (
    icl_test_config_overrides,
    make_synthetic_dataset,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the spoofed 8-device platform"
)


@pytest.fixture(scope="module")
def synthetic_hdf5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "synthetic.hdf5")
    return make_synthetic_dataset(path, n_demos=6, demo_len=30)


def _make_cfg(dataset_path, tmpdir, num_devices):
    d = icl_test_config_overrides()
    d["train"]["data"] = dataset_path
    d["train"]["output_dir"] = str(tmpdir)
    d["train"]["batch_size"] = 16  # divisible by 8, halves split to 8/8
    d["train"]["num_devices"] = num_devices
    return config_factory("icl", d)


def test_train_driver_sharded_end_to_end(synthetic_hdf5, tmp_path):
    """train() with train.num_devices=8 runs sharded and checkpoints."""
    from lipvq_tpu.scripts.train import train

    cfg = _make_cfg(synthetic_hdf5, tmp_path, num_devices=8)
    ckpt_dir = train(cfg)
    assert glob.glob(os.path.join(ckpt_dir, "*.ckpt"))


def test_sharded_loss_matches_single_device(synthetic_hdf5):
    """Same seed, same batches: the 8-device DP loss trajectory must match
    the 1-device run (GSPMD psum vs single-device reduction — only
    float-accumulation-order noise allowed)."""
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.parallel.mesh import make_mesh
    from lipvq_tpu.utils import obs_utils as ObsUtils
    from lipvq_tpu.utils.file_utils import get_shape_metadata_from_dataset

    cfg = _make_cfg(synthetic_hdf5, "/tmp", num_devices=None)
    ObsUtils.initialize_obs_utils_with_config(cfg)
    shape_meta = get_shape_metadata_from_dataset(
        synthetic_hdf5, all_obs_keys=cfg.all_obs_keys
    )

    def build():
        return algo_factory(
            "icl", cfg, obs_key_shapes=shape_meta["all_shapes"],
            ac_dim=shape_meta["ac_dim"],
        )

    m_single = build()
    m_sharded = build()
    m_sharded.attach_mesh(make_mesh(8))

    rng = np.random.default_rng(0)
    t = m_single.context_length
    losses = {"single": [], "sharded": []}
    for _ in range(4):
        batch = {
            "obs": {
                k: rng.standard_normal((16, t) + tuple(s)).astype(np.float32)
                for k, s in shape_meta["all_shapes"].items()
            },
            "actions": rng.standard_normal((16, t, 12)).astype(np.float32),
            "goal_obs": None,
        }
        for name, m in (("single", m_single), ("sharded", m_sharded)):
            info = m.train_on_batch(dict(batch), epoch=1)
            losses[name].append(float(info["losses"]["action_loss"]))

    np.testing.assert_allclose(
        losses["sharded"], losses["single"], rtol=1e-4,
        err_msg=f"trajectories diverged: {losses}",
    )


def test_batch_divisibility_error(synthetic_hdf5):
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.parallel.mesh import make_mesh
    from lipvq_tpu.utils import obs_utils as ObsUtils
    from lipvq_tpu.utils.file_utils import get_shape_metadata_from_dataset

    cfg = _make_cfg(synthetic_hdf5, "/tmp", num_devices=None)
    ObsUtils.initialize_obs_utils_with_config(cfg)
    shape_meta = get_shape_metadata_from_dataset(
        synthetic_hdf5, all_obs_keys=cfg.all_obs_keys
    )
    m = algo_factory(
        "icl", cfg, obs_key_shapes=shape_meta["all_shapes"],
        ac_dim=shape_meta["ac_dim"],
    )
    m.attach_mesh(make_mesh(8))
    t = m.context_length
    bad = {
        "obs": {
            k: np.zeros((6, t) + tuple(s), np.float32)
            for k, s in shape_meta["all_shapes"].items()
        },
        "actions": np.zeros((6, t, 12), np.float32),
        "goal_obs": None,
    }
    with pytest.raises(ValueError, match="not divisible"):
        m.train_on_batch(bad, epoch=1)
