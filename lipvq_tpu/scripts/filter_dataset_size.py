"""Create filter keys limiting demo count (counterpart of reference
scripts/filter_dataset_size.py — e.g. 'Nway' subsets for data-scaling
sweeps)."""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def filter_dataset_size(hdf5_path: str, sizes: list[int], seed: int = 0):
    with h5py.File(hdf5_path, "a") as f:
        demos = sorted(f["data"].keys(), key=lambda e: int(e[5:]))
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(demos))
        for n in sizes:
            assert n <= len(demos), f"{n} > {len(demos)} demos"
            subset = sorted(order[:n])
            key = f"mask/{n}_demos"
            if key in f:
                del f[key]
            f[key] = np.array([demos[i].encode("utf-8") for i in subset])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--sizes", type=int, nargs="+", required=True)
    args = parser.parse_args()
    filter_dataset_size(args.dataset, args.sizes)
    print(f"wrote filter keys for sizes {args.sizes}")


if __name__ == "__main__":
    main()
