"""Create train/valid filter keys in a robomimic HDF5.

Counterpart of reference scripts/split_train_val.py: writes
``mask/train`` and ``mask/valid`` demo-name lists with a held-out ratio.

    python -m lipvq_tpu.scripts.split_train_val --dataset D.hdf5 --ratio 0.1
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def split_train_val_from_hdf5(hdf5_path: str, val_ratio: float = 0.1,
                              filter_key: str | None = None, seed: int = 0):
    with h5py.File(hdf5_path, "a") as f:
        if filter_key is not None:
            demos = [e.decode("utf-8") for e in f[f"mask/{filter_key}"][:]]
        else:
            demos = sorted(f["data"].keys(), key=lambda e: int(e[5:]))
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(demos))
        n_val = max(1, int(round(val_ratio * len(demos))))
        val = sorted(order[:n_val])
        train = sorted(order[n_val:])
        name_prefix = f"{filter_key}_" if filter_key else ""
        for name, idx in ((f"{name_prefix}train", train),
                          (f"{name_prefix}valid", val)):
            key = f"mask/{name}"
            if key in f:
                del f[key]
            f[key] = np.array(
                [demos[i].encode("utf-8") for i in idx]
            )
        return len(train), len(val)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--ratio", type=float, default=0.1)
    parser.add_argument("--filter_key", type=str, default=None)
    args = parser.parse_args()
    n_train, n_val = split_train_val_from_hdf5(
        args.dataset, args.ratio, args.filter_key
    )
    print(f"train: {n_train} demos, valid: {n_val} demos")


if __name__ == "__main__":
    main()
