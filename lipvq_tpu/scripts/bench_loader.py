"""Host dataloader throughput at the image protocol.

VERDICT r2 weak #4: the reference trains the image modality with 5
torch DataLoader worker processes (config_gen_utils.py:232-238,
train.py:213); this framework's single-thread collate path had no
measurement against the 68 ms/step device time. This bench builds a
synthetic image-protocol HDF5 (2 camera streams, 128x128x3 uint8,
10-frame windows, batch 16), measures batches/s for the single-thread
DataLoader, the thread PrefetchLoader, and the MultiprocessLoader at
several worker counts, and reports each against the device step rate.

    python -m lipvq_tpu.scripts.bench_loader [--device_step_ms 68]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def build_fixture(path, n_demos=12, steps=40, img=128):
    import h5py

    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        env_args = {"env_name": "SyntheticImage", "type": 1,
                    "env_kwargs": {}}
        data.attrs["env_args"] = json.dumps(env_args)
        for d in range(n_demos):
            g = data.create_group(f"demo_{d}")
            g.attrs["num_samples"] = steps
            g.attrs["ep_meta"] = json.dumps({"lang": "synthetic image demo"})
            obs = g.create_group("obs")
            for cam in ("robot0_agentview_left_image",
                        "robot0_eye_in_hand_image"):
                obs.create_dataset(
                    cam,
                    data=rng.integers(0, 255, (steps, img, img, 3),
                                      dtype=np.uint8),
                )
            obs.create_dataset(
                "robot0_eef_pos",
                data=rng.standard_normal((steps, 3)).astype(np.float32),
            )
            g.create_dataset(
                "actions",
                data=rng.standard_normal((steps, 12)).astype(np.float32),
            )
    return path


def make_dataset(path):
    from lipvq_tpu.data.dataset import SequenceDataset
    from lipvq_tpu.utils import obs_utils as ObsUtils

    ObsUtils.register_obs_keys(
        {"robot0_agentview_left_image": "rgb",
         "robot0_eye_in_hand_image": "rgb",
         "robot0_eef_pos": "low_dim"}
    )
    return SequenceDataset(
        hdf5_path=path,
        obs_keys=("robot0_agentview_left_image", "robot0_eye_in_hand_image",
                  "robot0_eef_pos"),
        dataset_keys=("actions",),
        frame_stack=1,
        seq_length=10,
        pad_frame_stack=True,
        pad_seq_length=True,
        hdf5_cache_mode=None,
        hdf5_use_swmr=True,
    )


def time_loader(loader, n_batches=30, warmup=3):
    it = iter(loader)
    for _ in range(warmup):
        next(it)
    t0 = time.time()
    got = 0
    while got < n_batches:
        try:
            next(it)
        except StopIteration:
            it = iter(loader)
            continue
        got += 1
    dt = time.time() - t0
    if hasattr(loader, "shutdown"):
        loader.shutdown()
    return n_batches / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--device_step_ms", type=float, default=68.0,
                    help="image-protocol device step time to keep fed")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--n_batches", type=int, default=30)
    args = ap.parse_args(argv)

    from lipvq_tpu.data.loaders import (
        DataLoader,
        MultiprocessLoader,
        PrefetchLoader,
    )

    with tempfile.TemporaryDirectory() as td:
        path = build_fixture(os.path.join(td, "img.hdf5"))
        ds = make_dataset(path)
        need = 1000.0 / args.device_step_ms
        results = {}

        base = DataLoader(ds, batch_size=args.batch_size, shuffle=True)
        results["single_thread"] = time_loader(base, args.n_batches)
        results["prefetch_thread"] = time_loader(
            PrefetchLoader(
                DataLoader(ds, batch_size=args.batch_size, shuffle=True)
            ),
            args.n_batches,
        )
        for w in (2, 4):
            mp = MultiprocessLoader(
                ds, batch_size=args.batch_size, shuffle=True, num_workers=w
            )
            results[f"multiprocess_{w}w"] = time_loader(mp, args.n_batches)

        out = {
            "metric": "image_protocol_loader_batches_per_sec",
            "device_step_rate": round(need, 2),
            **{k: round(v, 2) for k, v in results.items()},
            "keeps_device_fed": {
                k: bool(v >= need) for k, v in results.items()
            },
        }
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
