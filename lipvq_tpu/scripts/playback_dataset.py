"""Replay demos through the environment (actions or states) and render.

Counterpart of reference scripts/playback_dataset.py: replay by stored
sim states (``reset_to`` each step) or by stepping stored actions; write
videos or just verify playback.

    python -m lipvq_tpu.scripts.playback_dataset --dataset D.hdf5 \
        --n 3 [--use-actions] [--video_path out.mp4]
"""

from __future__ import annotations

import argparse
import json

import h5py
import numpy as np

from lipvq_tpu.envs.env_factory import create_env_from_metadata


def playback_trajectory(env, demo_group, use_actions: bool = False,
                        video_writer=None, video_skip: int = 5):
    n = int(demo_group.attrs["num_samples"])
    if use_actions:
        env.reset()
        actions = np.asarray(demo_group["actions"])
        for t in range(n):
            env.step(actions[t])
            if video_writer is not None and t % video_skip == 0:
                video_writer.append_data(
                    env.render(mode="rgb_array", height=256, width=256)
                )
    else:
        states = np.asarray(demo_group["states"])
        init = {"states": states[0]}
        if "model_file" in demo_group.attrs:
            init["model"] = demo_group.attrs["model_file"]
        env.reset_to(init)
        for t in range(n):
            env.reset_to({"states": states[t]})
            if video_writer is not None and t % video_skip == 0:
                video_writer.append_data(
                    env.render(mode="rgb_array", height=256, width=256)
                )
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--n", type=int, default=3)
    parser.add_argument("--use-actions", action="store_true")
    parser.add_argument("--video_path", type=str, default=None)
    parser.add_argument("--video_skip", type=int, default=5)
    parser.add_argument("--filter_key", type=str, default=None)
    args = parser.parse_args()

    with h5py.File(args.dataset, "r") as f:
        env_meta = json.loads(f["data"].attrs["env_args"])
        env = create_env_from_metadata(env_meta, render_offscreen=True)
        if args.filter_key:
            demos = [e.decode("utf-8")
                     for e in f[f"mask/{args.filter_key}"][:]]
        else:
            demos = sorted(f["data"].keys(), key=lambda e: int(e[5:]))
        writer = None
        if args.video_path:
            import imageio

            writer = imageio.get_writer(args.video_path, fps=20)
        for d in demos[: args.n]:
            steps = playback_trajectory(
                env, f[f"data/{d}"], use_actions=args.use_actions,
                video_writer=writer, video_skip=args.video_skip,
            )
            print(f"{d}: replayed {steps} steps")
        if writer is not None:
            writer.close()


if __name__ == "__main__":
    main()
