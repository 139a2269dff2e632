"""Extract observations from raw demo states — multiprocess pipeline.

Counterpart of reference robocasa/scripts/dataset_states_to_obs.py
(:445-530) and the robomimic copy (:386-399): N extractor processes pull
demo indices from a work queue, replay stored sim states through a
per-worker environment (recreating the env and continuing on any
exception — the reference's fault-tolerance behavior), and push
trajectories to a single writer process that owns the output HDF5
(same demo names, so filter keys carry over).

    python -m lipvq_tpu.scripts.dataset_states_to_obs --dataset in.hdf5 \
        --output_name out.hdf5 --num_procs 4
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os

import h5py
import numpy as np


def extract_trajectory(env, demo: dict, camera_names=(), camera_height=128,
                       camera_width=128):
    """Replay states; collect obs at every step (reference
    extract_trajectory)."""
    states = demo["states"]
    n = states.shape[0]
    traj = {"obs": [], "actions": demo["actions"], "states": states,
            "rewards": np.zeros(n, np.float32),
            "dones": np.zeros(n, np.float32)}
    init = {"states": states[0]}
    if demo.get("model_file"):
        init["model"] = demo["model_file"]
    if demo.get("ep_meta"):
        init["ep_meta"] = demo["ep_meta"]
    env.reset_to(init)
    for t in range(n):
        env.reset_to({"states": states[t]})
        ob = env.get_observation()
        for cam in camera_names:
            ob[f"{cam}_image"] = env.render(
                mode="rgb_array", height=camera_height, width=camera_width,
                camera_name=cam,
            )
        traj["obs"].append(ob)
        succ = env.is_success()
        traj["rewards"][t] = float(succ["task"])
        traj["dones"][t] = float(t == n - 1)
    # list-of-dicts -> dict-of-arrays
    keys = traj["obs"][0].keys()
    traj["obs"] = {k: np.stack([o[k] for o in traj["obs"]]) for k in keys}
    return traj


def _worker(env_meta, dataset_path, work_queue, out_queue, camera_names,
            camera_height, camera_width):
    from lipvq_tpu.envs.env_factory import create_env_from_metadata

    env = create_env_from_metadata(env_meta, render_offscreen=bool(camera_names))
    f = h5py.File(dataset_path, "r", swmr=True, libver="latest")
    while True:
        item = work_queue.get()
        if item is None:
            break
        demo_name = item
        try:
            g = f[f"data/{demo_name}"]
            demo = {
                "states": np.asarray(g["states"]),
                "actions": np.asarray(g["actions"]),
                "model_file": g.attrs.get("model_file", None),
                "ep_meta": g.attrs.get("ep_meta", None),
            }
            traj = extract_trajectory(
                env, demo, camera_names, camera_height, camera_width
            )
            attrs = {
                "num_samples": int(traj["actions"].shape[0]),
                "ep_meta": g.attrs.get("ep_meta", "{}"),
            }
            out_queue.put((demo_name, traj, attrs))
        except Exception as e:  # recreate env and continue (reference :386-399)
            print(f"[worker] {demo_name} failed ({type(e).__name__}: {e}); "
                  "recreating env")
            try:
                env = create_env_from_metadata(
                    env_meta, render_offscreen=bool(camera_names)
                )
            except Exception:
                pass
            out_queue.put((demo_name, None, None))
    f.close()


def _writer(output_path, env_meta, total, out_queue, done_event):
    with h5py.File(output_path, "w") as fo:
        data = fo.create_group("data")
        data.attrs["env_args"] = json.dumps(env_meta)
        written = 0
        failed = []
        for _ in range(total):
            demo_name, traj, attrs = out_queue.get()
            if traj is None:
                failed.append(demo_name)
                continue
            g = data.create_group(demo_name)
            for k in ("actions", "states", "rewards", "dones"):
                g.create_dataset(k, data=traj[k])
            og = g.create_group("obs")
            for k, v in traj["obs"].items():
                og.create_dataset(k, data=v)
            for k, v in attrs.items():
                g.attrs[k] = v
            written += 1
        data.attrs["total"] = written
        print(f"[writer] wrote {written}/{total} demos "
              f"({len(failed)} failed: {failed[:5]})")
    done_event.set()


def dataset_states_to_obs_multiprocessing(
    dataset_path: str, output_path: str, num_procs: int = 2,
    camera_names=(), camera_height: int = 128, camera_width: int = 128,
    filter_key: str | None = None, randomize_cameras: bool = False,
):
    with h5py.File(dataset_path, "r") as f:
        env_meta = json.loads(f["data"].attrs["env_args"])
        if randomize_cameras:
            # reference dataset_states_to_obs.py:349-350
            env_meta.setdefault("env_kwargs", {})["randomize_cameras"] = True
        if filter_key:
            demos = [e.decode("utf-8") for e in f[f"mask/{filter_key}"][:]]
        else:
            demos = sorted(f["data"].keys(), key=lambda e: int(e[5:]))

    ctx = mp.get_context("spawn")
    work_queue = ctx.Queue()
    out_queue = ctx.Queue()
    done = ctx.Event()
    for d in demos:
        work_queue.put(d)
    for _ in range(num_procs):
        work_queue.put(None)

    writer = ctx.Process(
        target=_writer, args=(output_path, env_meta, len(demos), out_queue,
                              done),
    )
    writer.start()
    workers = [
        ctx.Process(
            target=_worker,
            args=(env_meta, dataset_path, work_queue, out_queue,
                  tuple(camera_names), camera_height, camera_width),
        )
        for _ in range(num_procs)
    ]
    for w in workers:
        w.start()
    for w in workers:
        w.join()
    done.wait()
    writer.join()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output_name", type=str, required=True)
    parser.add_argument("--num_procs", type=int, default=2)
    parser.add_argument("--camera_names", type=str, nargs="*", default=[])
    parser.add_argument("--camera_height", type=int, default=128)
    parser.add_argument("--camera_width", type=int, default=128)
    parser.add_argument("--filter_key", type=str, default=None)
    # reference dataset_states_to_obs.py:663
    parser.add_argument("--randomize_cameras", action="store_true")
    args = parser.parse_args()
    output_path = os.path.join(
        os.path.dirname(os.path.abspath(args.dataset)), args.output_name
    )
    dataset_states_to_obs_multiprocessing(
        args.dataset, output_path, num_procs=args.num_procs,
        camera_names=args.camera_names, camera_height=args.camera_height,
        camera_width=args.camera_width, filter_key=args.filter_key,
        randomize_cameras=args.randomize_cameras,
    )


if __name__ == "__main__":
    main()
