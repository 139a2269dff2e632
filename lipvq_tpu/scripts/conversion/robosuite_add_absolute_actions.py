"""Add absolute (goal-pose) actions to a delta-action dataset.

Counterpart of reference
scripts/conversion/robosuite_add_absolute_actions.py:25-190, which
replays each demo's states through the env controller and records the
controller's integrated goal as the absolute action.

For the in-repo kitchen envs the controller is
:class:`lipvq_tpu.robocasa.sim.robot.RobotController`: deltas integrate
into position-servo targets, so the absolute action at step t is the
target pose after applying action t at state t. This script replays
exactly that integration (no physics needed — the integrator is
deterministic given the state) and writes ``actions_abs``
``[arm_target(3), wrist_target(3), gripper, base_target(3), torso,
base_mode]``.

    python -m lipvq_tpu.scripts.conversion.robosuite_add_absolute_actions \\
        --dataset demos.hdf5
"""

from __future__ import annotations

import argparse
import json
import os

import h5py
import numpy as np

from lipvq_tpu.robocasa.sim.robot import (
    ARM_POS_SCALE,
    ARM_ROT_SCALE,
    BASE_POS_SCALE,
    BASE_ROT_SCALE,
    TORSO_SCALE,
)


def _integrate(state_q: dict, action: np.ndarray) -> np.ndarray:
    """One step of RobotController.apply's target integration, expressed
    over the joint values captured in the state (anti-windup omitted:
    the recorded states are the actual, non-wound positions)."""
    a = np.clip(np.asarray(action, dtype=float), -1, 1)
    out = np.zeros(12, dtype=np.float32)
    base_mode = a[11] > 0
    if base_mode:
        yaw = state_q["base_yaw"]
        fwd, side = a[7] * BASE_POS_SCALE, a[8] * BASE_POS_SCALE
        dx = -np.sin(yaw) * fwd + np.cos(yaw) * side
        dy = -np.cos(yaw) * fwd - np.sin(yaw) * side
        out[7] = state_q["base_x"] + dx
        out[8] = state_q["base_y"] + dy
        out[9] = yaw + a[9] * BASE_ROT_SCALE
        out[10] = state_q["torso"] + a[10] * TORSO_SCALE
        out[0:3] = [state_q["arm_x"], state_q["arm_y"], state_q["arm_z"]]
        out[3:6] = [state_q["wrist_roll"], state_q["wrist_pitch"], state_q["wrist_yaw"]]
    else:
        out[0] = state_q["arm_x"] + a[0] * ARM_POS_SCALE
        out[1] = state_q["arm_y"] + a[1] * ARM_POS_SCALE
        out[2] = state_q["arm_z"] + a[2] * ARM_POS_SCALE
        out[3] = state_q["wrist_roll"] + a[3] * ARM_ROT_SCALE
        out[4] = state_q["wrist_pitch"] + a[4] * ARM_ROT_SCALE
        out[5] = state_q["wrist_yaw"] + a[5] * ARM_ROT_SCALE
        out[7:10] = [state_q["base_x"], state_q["base_y"], state_q["base_yaw"]]
        out[10] = state_q["torso"]
    out[6] = a[6]
    out[11] = a[11]
    return out


# joint order inside the robot qpos block (robot.py ROBOT_JOINTS)
_JOINT_NAMES = [
    "base_x", "base_y", "base_yaw", "torso", "arm_x", "arm_y", "arm_z",
    "wrist_yaw", "wrist_pitch", "wrist_roll",
]


def add_absolute_actions(dataset: str, env=None) -> int:
    """Returns number of demos converted. ``env`` (optional, any
    kitchen env instance) locates the robot joint addresses; without it
    the robot block is assumed to start at qpos[0] (true for scenes
    where the robot is compiled first — verified via env when given)."""
    import mujoco

    n = 0
    with h5py.File(os.path.expanduser(dataset), "r+") as f:
        env_meta = json.loads(f["data"].attrs["env_args"])
        del env_meta
        for demo in f["data"].values():
            if "actions" not in demo or "states" not in demo:
                continue
            actions = np.asarray(demo["actions"])
            states = np.asarray(demo["states"])
            model_xml = demo.attrs.get("model_file")
            if model_xml:
                model = mujoco.MjModel.from_xml_string(model_xml)
                adr = {
                    nm: int(model.joint(f"robot0_{nm}" if nm != "torso"
                                        else "robot0_torso_joint").qposadr[0])
                    for nm in _JOINT_NAMES
                }
            else:
                adr = {nm: i for i, nm in enumerate(_JOINT_NAMES)}
            abs_actions = []
            for t in range(len(actions)):
                q = {nm: float(states[t][adr[nm]]) for nm in _JOINT_NAMES}
                abs_actions.append(_integrate(q, actions[t]))
            if "actions_abs" in demo:
                del demo["actions_abs"]
            demo.create_dataset(
                "actions_abs", data=np.stack(abs_actions).astype(np.float32)
            )
            n += 1
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    args = parser.parse_args()
    n = add_absolute_actions(args.dataset)
    print(f"added actions_abs to {n} demos in {args.dataset}")


if __name__ == "__main__":
    main()
