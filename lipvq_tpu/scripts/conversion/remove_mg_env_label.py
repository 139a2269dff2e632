"""Strip the MimicGen "MG_" prefix from a dataset's env name.

Counterpart of reference scripts/conversion/remove_mg_env_label.py:1-27
(MimicGen writes env names like ``MG_OpenDrawer``; training envs are
registered without the prefix).
"""

from __future__ import annotations

import argparse
import json

import h5py


def remove_mg_label(dataset: str) -> str:
    with h5py.File(dataset, "r+") as f:
        env_args = json.loads(f["data"].attrs["env_args"])
        name = env_args.get("env_name", "")
        if name.startswith("MG_"):
            env_args["env_name"] = name[3:]
            f["data"].attrs["env_args"] = json.dumps(env_args)
        return env_args["env_name"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    args = parser.parse_args()
    name = remove_mg_label(args.dataset)
    print(f"env_name is now {name!r}")


if __name__ == "__main__":
    main()
