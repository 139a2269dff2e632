"""Copy datasets/groups between two robomimic HDF5s demo-by-demo.

Counterpart of reference scripts/copy_ds_key.py:5-32 — e.g. graft
``action_dict`` or extracted obs keys from a processed file onto a raw
one.

    python -m lipvq_tpu.scripts.conversion.copy_ds_key \\
        --src processed.hdf5 --target raw.hdf5 --keys action_dict actions_abs
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def copy_ds_keys(src: str, target: str, keys) -> int:
    n = 0
    with h5py.File(src, "r") as fs, h5py.File(target, "a") as ft:
        for ep in fs["data"]:
            if ep not in ft["data"]:
                continue
            s_ep, t_ep = fs["data"][ep], ft["data"][ep]
            for key in keys:
                if key not in s_ep:
                    continue
                node = s_ep[key]
                if isinstance(node, h5py.Dataset):
                    if key in t_ep:
                        del t_ep[key]
                    t_ep.create_dataset(key, data=np.asarray(node))
                else:  # group
                    grp = t_ep.require_group(key)
                    for k in node:
                        if k in grp:
                            del grp[k]
                        grp.create_dataset(k, data=np.asarray(node[k]))
                n += 1
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, required=True)
    parser.add_argument("--target", type=str, required=True)
    parser.add_argument("--keys", type=str, nargs="+", required=True)
    args = parser.parse_args()
    n = copy_ds_keys(args.src, args.target, args.keys)
    print(f"copied {n} key instances {args.src} -> {args.target}")


if __name__ == "__main__":
    main()
