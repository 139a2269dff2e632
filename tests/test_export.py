"""Policy export (StableHLO) round-trip + prefetch loader tests."""

import numpy as np

import lipvq_tpu.algo  # noqa: F401
from lipvq_tpu.algo.base import algo_factory
from lipvq_tpu.config import config_factory
from lipvq_tpu.utils.test_utils import icl_test_config_overrides


def _tiny_model():
    cfg = config_factory("icl", icl_test_config_overrides())
    obs_key_shapes = {
        "robot0_eef_pos": [3], "robot0_eef_quat": [4],
        "robot0_gripper_qpos": [2], "object": [14], "lang_emb": [768],
    }
    return algo_factory("icl", cfg, obs_key_shapes, ac_dim=12)


def test_export_roundtrip(tmp_path):
    from lipvq_tpu.utils.file_utils import save_checkpoint
    from lipvq_tpu.scripts.export_policy import export_policy, load_and_run

    model = _tiny_model()
    ckpt = str(tmp_path / "m.ckpt")
    shape_meta = {
        "all_shapes": {k: list(v) for k, v in model.obs_shapes.items()},
        "all_obs_keys": list(model.obs_shapes),
        "ac_dim": model.ac_dim,
    }
    save_checkpoint(ckpt, model, model.global_config, shape_meta=shape_meta)
    out = str(tmp_path / "policy.stablehlo")
    export_policy(ckpt, out, batch=1)

    action = load_and_run(out, model)
    action = np.asarray(action)
    assert action.shape == (1, 12)
    assert np.isfinite(action).all()


def test_prefetch_loader_matches_plain(tmp_path, rng):
    from lipvq_tpu.data.dataset import SequenceDataset
    from lipvq_tpu.data.loaders import DataLoader, PrefetchLoader
    from lipvq_tpu.utils.test_utils import make_synthetic_dataset

    path = make_synthetic_dataset(str(tmp_path / "d.hdf5"), n_demos=4,
                                  demo_len=20)
    ds = SequenceDataset(path, obs_keys=["object"], dataset_keys=["actions"],
                         frame_stack=1, seq_length=5)
    plain = DataLoader(ds, batch_size=8, shuffle=True, seed=5)
    pre = PrefetchLoader(DataLoader(ds, batch_size=8, shuffle=True, seed=5))
    assert len(plain) == len(pre)
    b1 = [b["actions"] for b in plain]
    b2 = [b["actions"] for b in pre]
    assert len(b1) == len(b2)
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
