"""Teleop device mapping + momart adapter gating tests."""

import io

import numpy as np
import pytest

from lipvq_tpu.robocasa.sim.devices import KEY_BINDINGS, Keyboard, make_device


def test_keyboard_key_mapping():
    kb = Keyboard(stdin=io.StringIO())
    a = np.zeros(12, np.float32)
    kb.process_key("w", a)
    assert a[0] == 1.0
    kb.process_key("a", a)
    assert a[1] == -1.0
    kb.process_key(" ", a)  # toggle gripper
    kb.process_key("b", a)  # toggle base mode
    act, ctrl = kb.get_action()
    assert act[6] == 1.0 and act[11] == 1.0
    assert not ctrl["done"]
    kb.process_key(".", a)
    assert kb.done and kb.success


def test_keyboard_episode_end():
    kb = Keyboard(stdin=io.StringIO())
    kb.process_key("q", np.zeros(12, np.float32))
    assert kb.done and not kb.success


def test_all_bindings_in_action_range():
    for key, (idx, sign) in KEY_BINDINGS.items():
        assert 0 <= idx < 12
        assert sign in (-1.0, 1.0)


def test_make_device_unknown():
    with pytest.raises(ValueError):
        make_device("joystick")


def test_momart_adapter_gated():
    from lipvq_tpu.envs.env_ig_momart import (
        MOMART_TASKS,
        EnvIGMomart,
        momart_dataset_url,
    )

    url = momart_dataset_url(MOMART_TASKS[0], "expert")
    assert url.startswith("http") and url.endswith(".hdf5")
    with pytest.raises((ImportError, Exception)):
        EnvIGMomart("TableSetupFromDishwasher")


def test_momart_factory_dispatch():
    from lipvq_tpu.envs.env_factory import create_env_from_metadata

    meta = {"env_name": "TableSetup", "type": 3, "env_kwargs": {}}
    with pytest.raises(ImportError):
        create_env_from_metadata(meta)
