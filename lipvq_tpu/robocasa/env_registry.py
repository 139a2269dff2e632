"""Kitchen environment registry.

Counterpart of reference robocasa/environments/kitchen/kitchen.py:46-74:
``REGISTERED_KITCHEN_ENVS`` populated by a registration metaclass-style
hook, plus ``ALL_KITCHEN_ENVIRONMENTS`` used by the validity tests
(reference tests/test_tasks_validity.py:5).

With robosuite/robocasa installed, importing those packages fills the
registry with the real MuJoCo kitchen tasks; hermetically, the registry
carries the full task list (SURVEY.md §2.2) with constructors that
route through the env factory — the synthetic env backs smoke testing,
and real tasks raise an informative error until the sim stack is
installed.
"""

from __future__ import annotations

from collections import OrderedDict

from lipvq_tpu.robocasa.dataset_registry import ALL_TASK_DATASETS

REGISTERED_KITCHEN_ENVS: dict = {}


def register_kitchen_env(name: str, factory=None):
    """Register a kitchen env constructor (reference kitchen.py:49-50)."""

    def decorator(fn):
        REGISTERED_KITCHEN_ENVS[name] = fn
        return fn

    if factory is not None:
        REGISTERED_KITCHEN_ENVS[name] = factory
        return factory
    return decorator


def _make_task_factory(task_name: str):
    def factory(**kwargs):
        # first-party MuJoCo kitchen sim (lipvq_tpu/robocasa/sim)
        from lipvq_tpu.envs.env_kitchen import EnvKitchen

        return EnvKitchen(task_name, **kwargs)

    factory.__name__ = task_name
    return factory


# populate with the full RoboCasa task list
for _task in ALL_TASK_DATASETS:
    REGISTERED_KITCHEN_ENVS.setdefault(_task, _make_task_factory(_task))

# hermetic stand-in
def _synthetic_factory(**kwargs):
    from lipvq_tpu.envs.env_synthetic import SyntheticKitchenEnv

    return SyntheticKitchenEnv(**kwargs)


REGISTERED_KITCHEN_ENVS.setdefault("SyntheticKitchen", _synthetic_factory)

ALL_KITCHEN_ENVIRONMENTS = OrderedDict(
    sorted(REGISTERED_KITCHEN_ENVS.items())
)
