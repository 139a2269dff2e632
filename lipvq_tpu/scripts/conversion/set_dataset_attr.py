"""Set/patch attributes on a robomimic HDF5 (e.g. env_args fields).

Counterpart of reference scripts/conversion/set_dataset_attr.py:1-98.

    python -m lipvq_tpu.scripts.conversion.set_dataset_attr \\
        --dataset d.hdf5 --attr env_args.env_name --value OpenDrawer
"""

from __future__ import annotations

import argparse
import json

import h5py


def set_attr(dataset: str, attr: str, value: str):
    with h5py.File(dataset, "r+") as f:
        if attr.startswith("env_args."):
            env_args = json.loads(f["data"].attrs.get("env_args", "{}"))
            key = attr.split(".", 1)[1]
            try:
                env_args[key] = json.loads(value)
            except json.JSONDecodeError:
                env_args[key] = value
            f["data"].attrs["env_args"] = json.dumps(env_args)
        else:
            try:
                f["data"].attrs[attr] = json.loads(value)
            except json.JSONDecodeError:
                f["data"].attrs[attr] = value


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--attr", type=str, required=True)
    parser.add_argument("--value", type=str, required=True)
    args = parser.parse_args()
    set_attr(args.dataset, args.attr, args.value)
    print(f"set {args.attr} on {args.dataset}")


if __name__ == "__main__":
    main()
