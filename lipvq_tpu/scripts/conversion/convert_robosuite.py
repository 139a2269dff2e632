"""Stamp robomimic env metadata onto a raw robosuite-collected HDF5.

Counterpart of reference scripts/conversion/convert_robosuite.py:1-112:
raw robosuite collection writes demos without the ``env_args`` attr the
training stack dispatches on; this adds it (and optional filter keys
for train/valid splits).

    python -m lipvq_tpu.scripts.conversion.convert_robosuite \\
        --dataset raw.hdf5 --env_name OpenDrawer
"""

from __future__ import annotations

import argparse
import json

import h5py
import numpy as np

from lipvq_tpu.envs.env_base import EnvType


def convert_robosuite(dataset: str, env_name: str | None = None,
                      env_kwargs: dict | None = None) -> dict:
    with h5py.File(dataset, "r+") as f:
        data = f["data"]
        # raw robosuite files keep the env name in data.attrs["env"]
        name = env_name or data.attrs.get("env") or data.attrs.get("env_name")
        if isinstance(name, bytes):
            name = name.decode()
        env_args = {
            "env_name": str(name),
            "type": EnvType.ROBOSUITE_TYPE,
            "env_kwargs": dict(env_kwargs or {}),
        }
        data.attrs["env_args"] = json.dumps(env_args)
        # ensure every demo has num_samples (older collections omit it)
        for demo in data.values():
            if "num_samples" not in demo.attrs and "actions" in demo:
                demo.attrs["num_samples"] = len(demo["actions"])
        # default filter key with all demos (reference behavior keeps
        # mask group optional; create an "all" mask for convenience)
        if "mask" not in f:
            mask = f.create_group("mask")
            demos = np.array(sorted(data.keys()), dtype="S")
            mask.create_dataset("all", data=demos)
        return env_args


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--env_name", type=str, default=None)
    parser.add_argument("--env_kwargs", type=str, default="{}",
                        help="json dict of env kwargs")
    args = parser.parse_args()
    env_args = convert_robosuite(
        args.dataset, args.env_name, json.loads(args.env_kwargs)
    )
    print(f"stamped env_args: {env_args}")


if __name__ == "__main__":
    main()
