"""Batched vector-env rollout tests (the path the reference left
unfinished — SURVEY.md Appendix B.8)."""

import numpy as np

from lipvq_tpu.envs.env_synthetic import SyntheticKitchenEnv
from lipvq_tpu.envs.vector_env import VectorEnv, batched_icl_rollout


def test_vector_env_lockstep():
    vec = VectorEnv(
        [lambda i=i: SyntheticKitchenEnv(seed=i) for i in range(4)],
        frame_stack=5,
    )
    obs = vec.reset()
    assert obs["robot0_eef_pos"].shape == (4, 5, 3)
    acts = np.zeros((4, 12), np.float32)
    obs, rews, dones, infos = vec.step(acts)
    assert rews.shape == (4,) and len(infos) == 4


class _BatchedScripted:
    def start_episode(self, lang=None):
        pass

    def batched(self, obs, context_batch):
        pos = obs["robot0_eef_pos"][:, -1]
        target = obs["object"][:, -1, :3]
        a = np.zeros((pos.shape[0], 12), np.float32)
        a[:, :3] = np.clip((target - pos) / 0.05, -1, 1)
        return a


def test_batched_rollout_scripted():
    vec = VectorEnv(
        [lambda i=i: SyntheticKitchenEnv(seed=10 + i, horizon=100)
         for i in range(3)],
        frame_stack=5,
    )
    stats = batched_icl_rollout(
        _BatchedScripted(), vec, None, horizon=100,
        terminate_on_success=True,
    )
    assert stats["Success_Rate"] == 1.0
    assert stats["Horizon"] < 100


def test_batched_rollout_trained_icl():
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.algo.rollout_policy import ICLRolloutPolicy
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.utils.test_utils import icl_test_config_overrides

    cfg = config_factory("icl", icl_test_config_overrides())
    obs_key_shapes = {
        "robot0_eef_pos": [3], "robot0_eef_quat": [4],
        "robot0_gripper_qpos": [2], "object": [14], "lang_emb": [768],
    }
    model = algo_factory("icl", cfg, obs_key_shapes, ac_dim=12)
    t = model.context_length
    ctx = {
        "obs": {k: np.zeros((1, t) + tuple(s), np.float32)
                for k, s in obs_key_shapes.items()},
        "actions": np.zeros((1, t, 12), np.float32),
    }
    from lipvq_tpu.utils.lang_utils import LangEncoder

    policy = ICLRolloutPolicy(model, lang_encoder=LangEncoder())
    vec = VectorEnv(
        [lambda i=i: SyntheticKitchenEnv(seed=20 + i, horizon=10)
         for i in range(2)],
        frame_stack=t,
    )
    stats = batched_icl_rollout(policy, vec, ctx, horizon=4)
    assert np.isfinite(stats["Return"])
    assert stats["Horizon"] >= 1


def test_full_state_resume(tmp_path, rng):
    """serialize_full round-trips optimizer state (TPU-native improvement
    over the reference's params-only checkpoints, SURVEY.md §5.3)."""
    import jax.numpy as jnp

    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.utils.test_utils import icl_test_config_overrides

    cfg = config_factory("icl", icl_test_config_overrides())
    obs_key_shapes = {
        "robot0_eef_pos": [3], "robot0_eef_quat": [4],
        "robot0_gripper_qpos": [2], "object": [14], "lang_emb": [768],
    }
    model = algo_factory("icl", cfg, obs_key_shapes, ac_dim=12)
    batch = {
        "obs": {k: rng.standard_normal((8, 19, *s), dtype=np.float32)
                for k, s in obs_key_shapes.items()},
        "actions": rng.standard_normal((8, 19, 12)).astype(np.float32),
    }
    pb = model.process_batch_for_training(batch)
    model.train_on_batch(pb, epoch=0)
    blob = model.serialize_full()
    step_before = int(model.state.step)
    model.train_on_batch(pb, epoch=0)
    assert int(model.state.step) == step_before + 1
    model.deserialize_full(blob)
    assert int(model.state.step) == step_before
    # optimizer moments restored and nonzero (adam moments after one step)
    import jax

    moment_mass = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree.leaves(model.state.opt_state)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    )
    assert np.isfinite(moment_mass) and moment_mass > 0


def test_subproc_vector_env():
    """Pipe-based subprocess vector env (the reference's tianshou
    SubprocVectorEnv equivalent). Env factories must be picklable under
    the spawn start method — use functools.partial of the class."""
    import functools

    from lipvq_tpu.envs.vector_env import SubprocVectorEnv

    vec = SubprocVectorEnv(
        [functools.partial(SyntheticKitchenEnv, seed=0),
         functools.partial(SyntheticKitchenEnv, seed=1)],
        frame_stack=3,
    )
    try:
        obs = vec.reset()
        assert obs["robot0_eef_pos"].shape == (2, 3, 3)
        obs, rews, dones, infos = vec.step(np.zeros((2, 12)))
        assert rews.shape == (2,)
        succ = vec.is_success()
        assert len(succ) == 2 and "task" in succ[0]
    finally:
        vec.close()


def test_vector_env_obs_keys_filter():
    """Envs of one task can sample different object counts -> ragged
    task-object obs keys; obs_keys restricts stacking to the
    shape-stable keys the policy consumes."""

    class _RaggedEnv(SyntheticKitchenEnv):
        def __init__(self, n_extra, **kw):
            super().__init__(**kw)
            self._n_extra = n_extra

        def reset(self):
            obs = dict(super().reset())
            obs["task_objects"] = np.zeros(10 * self._n_extra, np.float32)
            return obs

        def step(self, action):
            obs, r, d, info = super().step(action)
            obs = dict(obs)
            obs["task_objects"] = np.zeros(10 * self._n_extra, np.float32)
            return obs, r, d, info

    fns = [lambda n=n: _RaggedEnv(n, seed=n) for n in (1, 2, 3)]
    import pytest

    with pytest.raises(ValueError):
        VectorEnv([f for f in fns], frame_stack=2).reset()
    vec = VectorEnv(fns, frame_stack=2,
                    obs_keys=["robot0_eef_pos", "object"])
    obs = vec.reset()
    assert set(obs) == {"robot0_eef_pos", "object"}
    obs, _, _, _ = vec.step(np.zeros((3, 12), np.float32))
    assert set(obs) == {"robot0_eef_pos", "object"}
