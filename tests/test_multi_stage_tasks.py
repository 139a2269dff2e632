"""Every registered kitchen task constructs, resets and steps.

Mirror of reference tests/test_tasks_validity.py:14-50 (create each
registered env + random rollout must not raise), parameterized over the
full registry, with the step budget trimmed (20 steps, 1 episode) so
the suite stays fast. Registry counts are asserted against the
reference surface: 20 multi-stage activity groups / 86 task classes
(one per file under reference
robocasa/environments/kitchen/multi_stage/).
"""

import importlib
import inspect
import pkgutil

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from lipvq_tpu.robocasa.sim import REGISTERED_KITCHEN_ENVS  # noqa: E402
import lipvq_tpu.robocasa.sim.multi_stage as ms  # noqa: E402

MULTI_STAGE_GROUPS = [m.name for m in pkgutil.iter_modules(ms.__path__)]


def _multi_stage_classes():
    out = {}
    for name in MULTI_STAGE_GROUPS:
        mod = importlib.import_module(f"lipvq_tpu.robocasa.sim.multi_stage.{name}")
        out[name] = [
            c.__name__
            for c in vars(mod).values()
            if inspect.isclass(c) and c.__module__ == mod.__name__
        ]
    return out


def test_registry_counts():
    """Reference multi_stage/ has 20 activity dirs, 86 task classes."""
    classes = _multi_stage_classes()
    assert len(classes) == 20, sorted(classes)
    total = sum(len(v) for v in classes.values())
    assert total == 86, classes
    for group, names in classes.items():
        assert names, f"activity group {group} registered no tasks"
        for n in names:
            assert n in REGISTERED_KITCHEN_ENVS, n


@pytest.mark.parametrize(
    "task",
    sorted(
        n for names in _multi_stage_classes().values() for n in names
    ),
)
def test_task_validity(task):
    """Reference test_tasks_validity.py:14-50, trimmed: construct,
    reset, 20 random actions; no exception, success stays boolean."""
    env = REGISTERED_KITCHEN_ENVS[task](seed=7)
    env.reset()
    assert env._ep_lang_str
    rng = np.random.default_rng(0)
    for _ in range(20):
        obs, reward, done, info = env.step(rng.uniform(-0.3, 0.3, size=12))
        assert isinstance(info["is_success"]["task"], (bool, np.bool_))
    env.close()
