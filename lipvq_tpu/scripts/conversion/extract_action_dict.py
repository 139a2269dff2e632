"""Split flat action vectors into the per-component ``action_dict``.

Counterpart of reference scripts/conversion/extract_action_dict.py:12-66:
for each of ``actions`` (relative) and ``actions_abs`` (absolute), write
``action_dict/{rel_,abs_}{pos,rot_axis_angle,rot_6d}`` + ``gripper``
(+ ``base_mode`` for mobile-base action spaces). These are exactly the
A.1 action keys the robocasa configs train on
(reference config_gen_utils.py:50-86).

    python -m lipvq_tpu.scripts.conversion.extract_action_dict \\
        --dataset demos.hdf5
"""

from __future__ import annotations

import argparse
import os

import h5py
import numpy as np

from lipvq_tpu.utils.action_utils import axis_angle_to_rot_6d

SPECS = [
    {"key": "actions", "prefix": "rel_"},
    {"key": "actions_abs", "prefix": "abs_"},
]


def extract_action_dict(dataset: str) -> int:
    """Returns the number of demos updated."""
    n_updated = 0
    with h5py.File(os.path.expanduser(dataset), "r+") as f:
        for spec in SPECS:
            key, prefix = spec["key"], spec["prefix"]
            for demo in f["data"].values():
                if key not in demo:
                    continue
                act = np.asarray(demo[key], dtype=np.float32)
                pos = act[:, :3]
                rot = act[:, 3:6]
                grip = act[:, 6:7]
                out = {
                    prefix + "pos": pos,
                    prefix + "rot_axis_angle": rot,
                    prefix + "rot_6d": axis_angle_to_rot_6d(rot).astype(
                        np.float32
                    ),
                    "gripper": grip,
                }
                # mobile-base action spaces carry base/mode channels
                # (reference extract_action_dict.py:56-58 handles the
                # 8-dim case; the kitchen envs use 12-dim)
                if act.shape[1] >= 8:
                    out["base_mode"] = act[:, -1:]
                if act.shape[1] == 12:
                    out[prefix + "base"] = act[:, 7:10]
                    out[prefix + "torso"] = act[:, 10:11]
                grp = demo.require_group("action_dict")
                for k, v in out.items():
                    if k in grp:
                        del grp[k]
                    grp.create_dataset(k, data=v)
                n_updated += 1
    return n_updated


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    args = parser.parse_args()
    n = extract_action_dict(args.dataset)
    print(f"wrote action_dict for {n} demo/spec pairs in {args.dataset}")


if __name__ == "__main__":
    main()
