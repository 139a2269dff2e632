"""Print structure/stats of a robomimic HDF5
(counterpart of reference scripts/get_dataset_info.py)."""

from __future__ import annotations

import argparse
import json

import h5py
import numpy as np


def dataset_info(hdf5_path: str) -> dict:
    with h5py.File(hdf5_path, "r") as f:
        demos = sorted(f["data"].keys(), key=lambda e: int(e[5:]))
        lengths = [int(f[f"data/{d}"].attrs["num_samples"]) for d in demos]
        first = f[f"data/{demos[0]}"]
        obs_keys = {
            k: list(first[f"obs/{k}"].shape[1:]) for k in first["obs"]
        }
        env_meta = json.loads(f["data"].attrs["env_args"])
        filter_keys = list(f["mask"].keys()) if "mask" in f else []
        langs = set()
        for d in demos[:50]:
            ep_meta = f[f"data/{d}"].attrs.get("ep_meta")
            if ep_meta:
                langs.add(json.loads(ep_meta).get("lang"))
        return {
            "n_demos": len(demos),
            "total_samples": int(np.sum(lengths)),
            "traj_length_mean": float(np.mean(lengths)),
            "traj_length_min": int(np.min(lengths)),
            "traj_length_max": int(np.max(lengths)),
            "action_dim": int(first["actions"].shape[1]),
            "obs_keys": obs_keys,
            "env_name": env_meta.get("env_name"),
            "filter_keys": filter_keys,
            "languages": sorted(x for x in langs if x),
        }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    args = parser.parse_args()
    print(json.dumps(dataset_info(args.dataset), indent=2))


if __name__ == "__main__":
    main()
