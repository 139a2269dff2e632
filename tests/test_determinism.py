"""Determinism tests (SURVEY.md §5.2 / §4.2 equivalents):
- same PRNG key => bit-identical token IDs, independent of device count
  (1-device vs 8-device mesh sharding)
- same env seed => identical episode layout (the reference's
  test_env_determinism analogue for the synthetic env)
- demo collection round-trips through SequenceDataset
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from lipvq_tpu.envs.env_synthetic import SyntheticKitchenEnv
from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE
from lipvq_tpu.parallel.corpus import tokenize_array
from lipvq_tpu.parallel.mesh import make_mesh


def test_token_ids_invariant_to_sharding(rng):
    """SURVEY.md §5.2: fixed key => identical tokens across shard counts."""
    model = LipVQVAE(feature_dim=12, latent_dim=32, num_codes=64)
    x = rng.standard_normal((512, 12), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x[:8]))

    mesh1 = make_mesh(1)
    mesh8 = make_mesh(8)
    ids1 = tokenize_array(model, variables, x, mesh=mesh1, chunk=512)
    ids8 = tokenize_array(model, variables, x, mesh=mesh8, chunk=512)
    np.testing.assert_array_equal(ids1, ids8)

    # and across repeated runs
    ids8b = tokenize_array(model, variables, x, mesh=mesh8, chunk=512)
    np.testing.assert_array_equal(ids8, ids8b)


def test_env_seed_determinism():
    """Same seed => identical layout/goal/poses (reference
    tests/test_env_determinism.py:16-80 analogue)."""
    e1 = SyntheticKitchenEnv(seed=42)
    e2 = SyntheticKitchenEnv(seed=42)
    o1, o2 = e1.reset(), e2.reset()
    for k in o1:
        np.testing.assert_allclose(o1[k], o2[k], atol=1e-7)
    a = np.ones(12) * 0.3
    for _ in range(10):
        s1 = e1.step(a)[0]
        s2 = e2.step(a)[0]
    for k in s1:
        np.testing.assert_allclose(s1[k], s2[k], atol=1e-7)


def test_collect_demos_roundtrip(tmp_path):
    """Scripted demo collection writes a SequenceDataset-loadable HDF5."""
    from lipvq_tpu.data.dataset import SequenceDataset
    from lipvq_tpu.robocasa.env_utils import create_env
    from lipvq_tpu.scripts.collect_demos import (
        collect_demo,
        scripted_policy,
        write_demos,
    )

    env = create_env("SyntheticKitchen", seed=3)
    rng = np.random.default_rng(3)
    trajs = [collect_demo(env, scripted_policy, 60, rng)[0] for _ in range(3)]
    path = str(tmp_path / "demos.hdf5")
    write_demos(path, env, trajs)

    ds = SequenceDataset(
        path, obs_keys=["robot0_eef_pos", "object", "lang_emb"],
        dataset_keys=["actions"], frame_stack=5, seq_length=5,
        hdf5_cache_mode="all",
    )
    item = ds[0]
    assert item["actions"].shape == (9, 12)
    assert item["obs"]["lang_emb"].shape == (9, 768)
