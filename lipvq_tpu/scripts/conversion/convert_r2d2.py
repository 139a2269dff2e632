"""Convert a DROID/R2D2 raw trajectory HDF5 to the robomimic schema.

Counterpart of reference scripts/conversion/convert_r2d2.py:19-250.
The reference decodes MP4 camera recordings (r2d2 package) into the
raw file and relies on ``R2D2Dataset`` reading the raw layout; this
version converts the raw DROID layout
(``observation/robot_state/{cartesian_position,gripper_position,...}``,
``action/{cartesian_velocity,cartesian_position,gripper_position}``)
into standard ``data/demo_i`` groups so the plain SequenceDataset —
and the in-repo ``R2D2Dataset`` gripper-segmentation variant — can
read it. Camera decoding is skipped when no image groups exist.

    python -m lipvq_tpu.scripts.conversion.convert_r2d2 \\
        --dataset trajectory.h5 --output converted.hdf5
"""

from __future__ import annotations

import argparse
import json

import h5py
import numpy as np

from lipvq_tpu.envs.env_base import EnvType
from lipvq_tpu.utils.action_utils import axis_angle_to_rot_6d


def convert_r2d2(dataset: str, output: str, lang: str = "") -> int:
    with h5py.File(dataset, "r") as src, h5py.File(output, "w") as dst:
        robot_state = src["observation"]["robot_state"]
        cart = np.asarray(robot_state["cartesian_position"], np.float32)
        grip_q = np.asarray(robot_state["gripper_position"], np.float32)
        if grip_q.ndim == 1:
            grip_q = grip_q[:, None]
        n = len(cart)

        act_grp = src["action"]
        if "cartesian_velocity" in act_grp:
            act_pose = np.asarray(act_grp["cartesian_velocity"], np.float32)
        else:
            act_pose = np.asarray(act_grp["cartesian_position"], np.float32)
        act_grip = np.asarray(act_grp["gripper_position"], np.float32)
        if act_grip.ndim == 1:
            act_grip = act_grip[:, None]
        actions = np.concatenate([act_pose[:, :6], act_grip], axis=1)

        data = dst.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "R2D2", "type": EnvType.GYM_TYPE, "env_kwargs": {}}
        )
        g = data.create_group("demo_0")
        g.create_dataset("actions", data=actions[:n].astype(np.float32))
        g.create_dataset("rewards", data=np.zeros(n, np.float32))
        g.create_dataset("dones", data=np.zeros(n, np.float32))
        og = g.create_group("obs")
        og.create_dataset("robot0_eef_pos", data=cart[:, :3])
        og.create_dataset(
            "robot0_eef_rot_6d", data=axis_angle_to_rot_6d(cart[:, 3:6])
        )
        og.create_dataset("robot0_gripper_qpos", data=grip_q)
        # pass through any extra low-dim state keys
        for k in robot_state:
            if k in ("cartesian_position", "gripper_position"):
                continue
            arr = np.asarray(robot_state[k])
            if arr.ndim <= 2 and arr.dtype.kind == "f" and len(arr) == n:
                og.create_dataset(f"robot0_{k}", data=arr.astype(np.float32))
        # action_dict (A.1 keys) from the 7-dim action
        ad = g.create_group("action_dict")
        ad.create_dataset("rel_pos", data=actions[:, :3])
        ad.create_dataset("rel_rot_axis_angle", data=actions[:, 3:6])
        ad.create_dataset(
            "rel_rot_6d", data=axis_angle_to_rot_6d(actions[:, 3:6])
        )
        ad.create_dataset("gripper", data=actions[:, 6:7])
        g.attrs["num_samples"] = n
        g.attrs["ep_meta"] = json.dumps({"lang": lang or "droid demo"})
        data.attrs["total"] = n
    return 1


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--lang", type=str, default="")
    args = parser.parse_args()
    n = convert_r2d2(args.dataset, args.output, args.lang)
    print(f"wrote {n} demo(s) to {args.output}")


if __name__ == "__main__":
    main()
