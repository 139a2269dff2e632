"""MuJoCo-direct kitchen simulation layer (reference robocasa L0).

A from-scratch procedural rebuild of the RoboCasa kitchen environments
(reference robocasa/environments/kitchen/kitchen.py:46-1633 and
robocasa/models/{fixtures,scenes}/) on top of the installed ``mujoco``
runtime — no robosuite and no mesh/texture asset pack. Fixtures are
parametric primitive-geom builders over :class:`mujoco.MjSpec`; scenes
are assembled procedurally per layout/style id; the robot is a simple
mobile manipulator honoring the robocasa 12-dim action layout.

Fidelity notes vs the reference (documented simplifications):
- fixture/object geometry is primitive boxes/cylinders, not the 5GB
  mesh zoo (unavailable in this environment);
- styles are material palettes rather than texture swaps
  (reference utils/texture_swap.py);
- the robot is a floating-gripper mobile base, not PandaOmron —
  the action contract (12-dim: arm dpos/drot, gripper, base, mode)
  matches reference config_gen_utils.py:46-87.

Everything else — the env registry, layout/style sampling, placement
samplers, fixture state APIs (doors/knobs/handles/buttons), episode
metadata, success checks, and the 30 dataset-registry tasks — follows
the reference behavioral contract with file:line citations in each
module.
"""

from lipvq_tpu.robocasa.sim.fixtures import (  # noqa: F401
    FixtureType,
    Fixture,
    Counter,
    SingleCabinet,
    HingeCabinet,
    OpenCabinet,
    Drawer,
    Microwave,
    Sink,
    Stove,
    CoffeeMachine,
    Fridge,
    Dishwasher,
    Hood,
)
from lipvq_tpu.robocasa.sim.kitchen import (  # noqa: F401
    Kitchen,
    REGISTERED_KITCHEN_ENVS,
    register_kitchen_env,
)

# importing the task modules populates REGISTERED_KITCHEN_ENVS
# (reference robocasa/environments/kitchen/__init__.py)
from lipvq_tpu.robocasa.sim import single_stage as _single_stage  # noqa: E402,F401
from lipvq_tpu.robocasa.sim import multi_stage as _multi_stage  # noqa: E402,F401
