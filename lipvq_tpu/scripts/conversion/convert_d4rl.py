"""Convert a D4RL-style flat transition buffer to the robomimic schema.

Counterpart of reference scripts/conversion/convert_d4rl.py:60-143:
the reference downloads via the ``d4rl`` package then splits the flat
``observations/actions/rewards/terminals[/timeouts]`` buffer into
per-episode ``data/demo_i`` groups with a gym env_args stamp. This
version takes the raw buffer file directly (D4RL HDF5 layout, or an
``.npz`` with the same keys — the package is not installable here) and
performs the identical episode-splitting and schema conversion.

    python -m lipvq_tpu.scripts.conversion.convert_d4rl \\
        --buffer walker2d-medium-v2.hdf5 --env_name Walker2d-v3 \\
        --output converted.hdf5
"""

from __future__ import annotations

import argparse
import json

import h5py
import numpy as np

from lipvq_tpu.envs.env_base import EnvType


def _load_buffer(path: str) -> dict:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    out = {}
    with h5py.File(path, "r") as f:
        for k in ("observations", "actions", "rewards", "terminals",
                  "timeouts", "next_observations"):
            if k in f:
                out[k] = np.asarray(f[k])
    return out

def convert_d4rl(buffer_path: str, env_name: str, output: str) -> int:
    """Split the flat buffer at terminal/timeout boundaries
    (reference convert_d4rl.py episode loop). Returns demo count."""
    buf = _load_buffer(buffer_path)
    obs = buf["observations"]
    acts = buf["actions"]
    rews = buf["rewards"].reshape(-1)
    terms = buf.get("terminals", np.zeros(len(acts))).reshape(-1)
    touts = buf.get("timeouts", np.zeros(len(acts))).reshape(-1)
    next_obs = buf.get("next_observations")

    ends = np.where((terms > 0) | (touts > 0))[0].tolist()
    if not ends or ends[-1] != len(acts) - 1:
        ends.append(len(acts) - 1)

    n_demos = 0
    total = 0
    with h5py.File(output, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": env_name, "type": EnvType.GYM_TYPE, "env_kwargs": {}}
        )
        start = 0
        for end in ends:
            sl = slice(start, end + 1)
            n = end + 1 - start
            if n < 2:
                start = end + 1
                continue
            g = data.create_group(f"demo_{n_demos}")
            g.create_dataset("actions", data=acts[sl].astype(np.float32))
            g.create_dataset("rewards", data=rews[sl].astype(np.float32))
            g.create_dataset("dones", data=terms[sl].astype(np.float32))
            og = g.create_group("obs")
            og.create_dataset("flat", data=obs[sl].astype(np.float32))
            nog = g.create_group("next_obs")
            if next_obs is not None:
                nog.create_dataset("flat", data=next_obs[sl].astype(np.float32))
            else:
                shifted = np.concatenate([obs[sl][1:], obs[sl][-1:]], axis=0)
                nog.create_dataset("flat", data=shifted.astype(np.float32))
            g.attrs["num_samples"] = n
            total += n
            n_demos += 1
            start = end + 1
        data.attrs["total"] = total
    return n_demos


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--buffer", type=str, required=True,
                        help="raw D4RL hdf5/npz buffer")
    parser.add_argument("--env_name", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args()
    n = convert_d4rl(args.buffer, args.env_name, args.output)
    print(f"wrote {n} demos to {args.output}")


if __name__ == "__main__":
    main()
