"""Data tooling tests: split/filter/info/playback/extraction/corpus
tokenization over the synthetic dataset."""

import json
import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

from lipvq_tpu.utils.test_utils import make_synthetic_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def ds(tmp_path):
    return make_synthetic_dataset(str(tmp_path / "d.hdf5"), n_demos=6,
                                  demo_len=25)


def test_split_train_val(ds):
    from lipvq_tpu.scripts.split_train_val import split_train_val_from_hdf5

    n_train, n_val = split_train_val_from_hdf5(ds, val_ratio=0.3)
    assert n_train + n_val == 6 and n_val == 2
    with h5py.File(ds, "r") as f:
        assert len(f["mask/train"]) == 4
        assert len(f["mask/valid"]) == 2


def test_filter_dataset_size(ds):
    from lipvq_tpu.scripts.filter_dataset_size import filter_dataset_size

    filter_dataset_size(ds, [2, 4])
    with h5py.File(ds, "r") as f:
        assert len(f["mask/2_demos"]) == 2
        assert len(f["mask/4_demos"]) == 4


def test_dataset_info(ds):
    from lipvq_tpu.scripts.get_dataset_info import dataset_info

    info = dataset_info(ds)
    assert info["n_demos"] == 6
    assert info["total_samples"] == 150
    assert info["action_dim"] == 12
    assert "object" in info["obs_keys"]
    assert info["env_name"] == "SyntheticKitchen"


def test_playback(ds):
    from lipvq_tpu.envs.env_factory import create_env_from_metadata
    from lipvq_tpu.scripts.playback_dataset import playback_trajectory

    with h5py.File(ds, "r") as f:
        env_meta = json.loads(f["data"].attrs["env_args"])
        env = create_env_from_metadata(env_meta)
        n = playback_trajectory(env, f["data/demo_0"], use_actions=True)
    assert n == 25


def test_states_to_obs_multiprocess(tmp_path):
    """The N-worker + writer extraction pipeline (SURVEY.md §3.5), run
    end-to-end: collected demos (with real 6-dim env states) replay
    through per-worker envs and produce an obs HDF5."""
    import numpy as np

    from lipvq_tpu.robocasa.env_utils import create_env
    from lipvq_tpu.scripts.collect_demos import (
        collect_demo, scripted_policy, write_demos,
    )
    from lipvq_tpu.scripts.dataset_states_to_obs import (
        dataset_states_to_obs_multiprocessing,
    )

    env = create_env("SyntheticKitchen", seed=5)
    rng = np.random.default_rng(5)
    trajs = [collect_demo(env, scripted_policy, 20, rng)[0] for _ in range(3)]
    src = str(tmp_path / "raw.hdf5")
    write_demos(src, env, trajs)

    out = str(tmp_path / "out.hdf5")
    dataset_states_to_obs_multiprocessing(src, out, num_procs=2)
    with h5py.File(out, "r") as f:
        assert f["data"].attrs["total"] >= 1
        demos = list(f["data"].keys())
        assert demos, "no demos extracted"
        g = f[f"data/{demos[0]}"]
        assert "obs/robot0_eef_pos" in g
        assert g["obs/robot0_eef_pos"].shape[1] == 3


def test_corpus_tokenization_roundtrip(ds):
    import jax

    from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE
    from lipvq_tpu.parallel.corpus import tokenize_hdf5_corpus
    from lipvq_tpu.parallel.mesh import make_mesh

    model = LipVQVAE(feature_dim=12, latent_dim=32, num_codes=64)
    variables = model.init(jax.random.PRNGKey(0), np.zeros((8, 12), np.float32))
    mesh = make_mesh()  # 8 spoofed CPU devices
    assert mesh.devices.size == 8
    stats = tokenize_hdf5_corpus(model, variables, [ds], mesh=mesh, write=True)
    assert stats["chunks"] == 150
    with h5py.File(ds, "r") as f:
        toks = np.asarray(f["data/demo_0/tokens/lipvq_tokens"])
        assert toks.shape == (25,)
        assert toks.dtype == np.int32
    # determinism: same key -> identical ids across runs (SURVEY.md §5.2)
    stats2 = tokenize_hdf5_corpus(model, variables, [ds], mesh=mesh, write=False)
    assert stats2["chunks"] == 150
