"""Closed-loop rollout tests over the synthetic env (exercises the full
env -> FrameStackWrapper -> ICLRolloutPolicy -> jitted get_action loop,
reference call stack SURVEY.md §3.2)."""

import numpy as np

from lipvq_tpu.envs.env_factory import create_env_from_metadata
from lipvq_tpu.envs.env_synthetic import SyntheticKitchenEnv
from lipvq_tpu.envs.rollout import icl_rollout_with_stats
from lipvq_tpu.envs.wrappers import FrameStackWrapper


def test_synthetic_env_api():
    env = SyntheticKitchenEnv(seed=0)
    ob = env.reset()
    assert set(ob) >= {"robot0_eef_pos", "object"}
    state = env.get_state()
    ob2, r, done, info = env.step(np.ones(12))
    assert "is_success" in info
    ob3 = env.reset_to(state)
    np.testing.assert_allclose(ob3["robot0_eef_pos"], ob["robot0_eef_pos"])
    img = env.render(mode="rgb_array", height=32, width=32)
    assert img.shape == (32, 32, 3)


def test_frame_stack_wrapper():
    env = FrameStackWrapper(SyntheticKitchenEnv(seed=1), num_frames=5)
    ob = env.reset()
    assert ob["robot0_eef_pos"].shape == (5, 3)
    # frames padded with repeats at reset
    np.testing.assert_array_equal(ob["robot0_eef_pos"][0], ob["robot0_eef_pos"][4])
    ob, _, _, _ = env.step(np.ones(12))
    assert ob["robot0_eef_pos"].shape == (5, 3)
    assert not np.allclose(ob["robot0_eef_pos"][0], ob["robot0_eef_pos"][4])


def test_env_factory():
    env = create_env_from_metadata(
        {"env_name": "SyntheticKitchen", "type": 99, "env_kwargs": {}}
    )
    assert env.name == "SyntheticKitchen"
    assert env.action_dimension == 12


class _ScriptedPolicy:
    """Heads straight to the goal — validates the rollout loop mechanics
    and success accounting without a trained network."""

    def start_episode(self, lang=None):
        self.lang = lang

    def __call__(self, ob, context_batch, goal=None):
        pos = ob["robot0_eef_pos"][-1]
        target = ob["object"][-1][:3]
        d = target - pos
        a = np.zeros(12, np.float32)
        a[:3] = np.clip(d / 0.05, -1, 1)
        return a


def test_icl_rollout_with_stats_scripted():
    envs = {"SyntheticKitchen": SyntheticKitchenEnv(seed=2, horizon=100)}
    logs, _ = icl_rollout_with_stats(
        policy=_ScriptedPolicy(),
        envs=envs,
        context_batch=None,
        horizon=100,
        num_episodes=3,
        terminate_on_success=True,
        frame_stack=5,
    )
    stats = logs["SyntheticKitchen"]
    assert stats["Success_Rate"] == 1.0  # scripted policy always succeeds
    assert stats["Horizon"] < 100  # terminate_on_success fired


def test_icl_rollout_with_trained_policy_api(tmp_path):
    """Full wiring: real ICL model + ICLRolloutPolicy + synthetic env."""
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.algo.rollout_policy import ICLRolloutPolicy
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.utils.lang_utils import LangEncoder
    from lipvq_tpu.utils.test_utils import icl_test_config_overrides

    d = icl_test_config_overrides()
    cfg = config_factory("icl", d)
    obs_key_shapes = {
        "robot0_eef_pos": [3], "robot0_eef_quat": [4],
        "robot0_gripper_qpos": [2], "object": [14], "lang_emb": [768],
    }
    model = algo_factory("icl", cfg, obs_key_shapes, ac_dim=12)
    t = model.context_length
    ctx = {
        "obs": {
            k: np.zeros((1, t) + tuple(s), np.float32)
            for k, s in obs_key_shapes.items()
        },
        "actions": np.zeros((1, t, 12), np.float32),
    }
    policy = ICLRolloutPolicy(model, lang_encoder=LangEncoder())
    envs = {"SyntheticKitchen": SyntheticKitchenEnv(seed=3, horizon=30)}
    logs, _ = icl_rollout_with_stats(
        policy=policy, envs=envs, context_batch=ctx,
        horizon=8, num_episodes=1, frame_stack=t,
    )
    stats = logs["SyntheticKitchen"]
    assert stats["Horizon"] >= 1
    assert np.isfinite(stats["Return"])


def test_set_inference_device_action_parity():
    """CPU-pinned inference (suite-eval fast path) matches default
    placement: same key -> near-identical actions, state committed."""
    import jax

    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.utils.test_utils import icl_test_config_overrides

    cfg = config_factory("icl", icl_test_config_overrides())
    shapes = {"robot0_eef_pos": [3], "lang_emb": [768]}
    model = algo_factory("icl", cfg, shapes, ac_dim=12)
    t = model.context_length
    obs = {k: np.random.default_rng(0).normal(size=(2, t) + tuple(s))
           .astype(np.float32) for k, s in shapes.items()}
    ctx = {"obs": {k: np.zeros((2, t) + tuple(s), np.float32)
                   for k, s in shapes.items()},
           "actions": np.zeros((2, t, 12), np.float32)}
    rng0 = model.state.rng
    a_default = model.get_action(obs, ctx)
    model.state = model.state._replace(rng=rng0)
    dev = jax.devices("cpu")[0]
    model.set_inference_device(dev)
    assert model._infer_device is dev
    for leaf in jax.tree.leaves(model.state.params):
        assert leaf.devices() == {dev}
    a_pinned = model.get_action(obs, ctx)
    np.testing.assert_allclose(a_default, a_pinned, atol=2e-3)


def test_rot6d_roundtrip(rng):
    from lipvq_tpu.utils.action_utils import (
        axis_angle_to_rot_6d,
        rot_6d_to_axis_angle,
    )

    aa = rng.uniform(-1, 1, (20, 3)).astype(np.float32)
    d6 = axis_angle_to_rot_6d(aa)
    back = rot_6d_to_axis_angle(d6)
    np.testing.assert_allclose(back, aa, atol=1e-4)
