"""EnvGym adapter + abs-action (action_dict + rot_6d) workflow tests."""

import numpy as np
import pytest

from lipvq_tpu.utils.action_utils import (
    action_dict_to_vector,
    axis_angle_to_rot_6d,
    vector_to_action_dict,
)


def test_env_gym_adapter():
    gymnasium = pytest.importorskip("gymnasium")
    from lipvq_tpu.envs.env_gym import EnvGym

    env = EnvGym("CartPole-v1")
    ob = env.reset()
    assert "flat" in ob and ob["flat"].shape == (4,)
    ob, r, done, info = env.step(0)
    assert "is_success" in info
    assert env.action_dimension == 1 or env.action_dimension >= 1


def test_abs_action_postprocess(rng):
    """min_max unnormalize + rot_6d -> axis-angle through the rollout
    policy's action postprocess (reference algo.py:786-805 + the
    robocasa abs-action keys, config_gen_utils.py:50-86)."""
    from lipvq_tpu.algo.rollout_policy import RolloutPolicy

    # stats for keys: abs_pos(3, min_max), abs_rot_6d(6, none), gripper(1)
    stats = {
        "action_dict/abs_pos": {
            "offset": np.array([0.1, -0.2, 0.3], np.float32),
            "scale": np.array([0.5, 0.5, 0.5], np.float32),
        },
        "action_dict/abs_rot_6d": {
            "offset": np.zeros(6, np.float32),
            "scale": np.ones(6, np.float32),
        },
        "action_dict/gripper": {
            "offset": np.zeros(1, np.float32),
            "scale": np.ones(1, np.float32),
        },
    }

    class _Stub:
        pass

    policy = RolloutPolicy(_Stub(), action_normalization_stats=stats)
    # network output: normalized pos + valid rot6d + gripper
    aa_true = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
    d6 = axis_angle_to_rot_6d(aa_true)
    pos_norm = rng.uniform(-1, 1, 3).astype(np.float32)
    ac = np.concatenate([pos_norm, d6, [0.5]]).astype(np.float32)
    out = policy._postprocess_action(ac)
    # layout: pos(3) + axis_angle(3) + gripper(1)
    assert out.shape == (7,)
    np.testing.assert_allclose(out[:3], pos_norm * 0.5 + stats[
        "action_dict/abs_pos"]["offset"], rtol=1e-5)
    np.testing.assert_allclose(out[3:6], aa_true, atol=1e-4)
    assert out[6] == pytest.approx(0.5)


def test_action_dict_vector_roundtrip(rng):
    shapes = {"a": (3,), "b": (6,)}
    v = rng.standard_normal(9).astype(np.float32)
    d = vector_to_action_dict(v, shapes)
    back = action_dict_to_vector(d)
    np.testing.assert_array_equal(back, v)
