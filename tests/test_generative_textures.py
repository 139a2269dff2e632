"""Procedural texture randomization (generative_textures knob).

Functional analogue of reference robocasa/utils/texture_swap.py and the
``generative_textures`` Kitchen kwarg: per-episode randomized textures
on floor/wall/counter/cabinet surfaces, deterministic per seed, and
bit-identical under reset_to replay.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from lipvq_tpu.robocasa.sim import REGISTERED_KITCHEN_ENVS  # noqa: E402


def _env(seed):
    return REGISTERED_KITCHEN_ENVS["NavigateKitchen"](
        seed=seed, generative_textures="100p"
    )


def test_textures_created_and_assigned():
    env = _env(0)
    env.reset()
    assert env.model.ntex >= 4
    assert env.model.nmat >= 4
    # some geoms actually carry the generated materials
    assert (env.model.geom_matid >= 0).sum() > 10
    assert set(env._texture_params) == {"floor", "wall", "counter", "cabinet"}
    env.close()


def test_same_seed_same_textures():
    a, b = _env(3), _env(3)
    a.reset()
    b.reset()
    assert a._texture_params == b._texture_params
    a.close()
    b.close()


def test_different_episodes_differ():
    env = _env(1)
    env.reset()
    p1 = env._texture_params
    env.reset()
    p2 = env._texture_params
    assert p1 != p2
    env.close()


def test_reset_to_replays_textures():
    env = _env(5)
    env.reset()
    state = env.get_state()
    params = env._texture_params
    env.reset()  # scramble
    assert env._texture_params != params
    env.reset_to(state)
    assert env._texture_params == params
    env.close()


def test_disabled_by_default():
    env = REGISTERED_KITCHEN_ENVS["NavigateKitchen"](seed=0)
    env.reset()
    assert env._texture_params is None
    assert "texture_params" not in env.get_ep_meta()
    env.close()
