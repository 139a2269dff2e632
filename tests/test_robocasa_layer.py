"""RoboCasa-layer tests: env registry validity (the reference
test_tasks_validity analogue), dataset registry, env speed bench."""

import numpy as np
import pytest

from lipvq_tpu.robocasa.dataset_registry import (
    ALL_TASK_DATASETS,
    MULTI_STAGE_TASK_DATASETS,
    SINGLE_STAGE_TASK_DATASETS,
    get_ds_path,
    get_task_horizon,
)
from lipvq_tpu.robocasa.env_registry import (
    ALL_KITCHEN_ENVIRONMENTS,
    REGISTERED_KITCHEN_ENVS,
)


def test_registry_task_list():
    """24 single-stage + 5 multi-stage tasks (SURVEY.md §2.2)."""
    assert len(SINGLE_STAGE_TASK_DATASETS) == 25  # incl. NavigateKitchen
    assert len(MULTI_STAGE_TASK_DATASETS) == 5
    assert get_task_horizon("OpenDoubleDoor") == 1000
    assert get_task_horizon("PnPCounterToSink") == 700
    assert get_task_horizon("CoffeePressButton") == 300


def test_ds_path_layout(tmp_path):
    p = get_ds_path("PnPCounterToCab", "human_im", base_path=str(tmp_path))
    assert p.endswith(
        "human/PnPCounterToCab/demo_gentex_im128_randcams.hdf5"
    )
    p, info = get_ds_path("PreSoakPan", "mg_im", return_info=True,
                          base_path=str(tmp_path))
    assert info["horizon"] == 1500


def test_env_registry_validity():
    """Every registered env constructs + steps — the reference
    test_tasks_validity.py:14-50 analogue. Since the MuJoCo-direct
    kitchen layer landed, the kitchen tasks run for real (no robosuite
    needed); deeper per-task coverage lives in tests/test_kitchen_sim.py."""
    assert set(ALL_TASK_DATASETS) <= set(REGISTERED_KITCHEN_ENVS)
    env = REGISTERED_KITCHEN_ENVS["SyntheticKitchen"](seed=0)
    env.reset()
    for _ in range(5):
        ob, r, done, info = env.step(np.zeros(12))
    assert "is_success" in info

    kitchen = REGISTERED_KITCHEN_ENVS["PnPCounterToCab"](seed=0)
    kitchen.reset()
    ob, r, done, info = kitchen.step(np.zeros(12))
    assert "is_success" in info
    kitchen.close()

    assert list(ALL_KITCHEN_ENVIRONMENTS) == sorted(ALL_KITCHEN_ENVIRONMENTS)


def test_bench_speed_harness():
    from lipvq_tpu.robocasa.bench_speed import bench_env

    stats = bench_env("SyntheticKitchen", n_steps=200, n_resets=3)
    assert stats["steps_per_sec"] > 100
    assert stats["reset_time_s"] >= 0
