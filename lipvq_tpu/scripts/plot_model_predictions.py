"""Plot predicted vs. ground-truth actions for a checkpoint.

Counterpart of reference scripts/plot_model_predictions.py:1-213: load
a policy checkpoint, run it open-loop over dataset trajectories, and
plot per-dimension predicted/actual action curves (the qualitative
companion to the ``action_accuracy@eps`` metrics in
``compute_mse_visualize``, reference algo.py:424-504).

    python -m lipvq_tpu.scripts.plot_model_predictions \\
        --ckpt model.ckpt --dataset demos.hdf5 --output plots/ --n_demos 2
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def plot_predictions(ckpt_path: str, dataset_path: str, output_dir: str,
                     n_demos: int = 2) -> list:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from lipvq_tpu.utils.file_utils import policy_from_checkpoint

    model, ckpt = policy_from_checkpoint(ckpt_path)
    del ckpt
    t = model.context_length

    import h5py

    out_paths = []
    os.makedirs(output_dir, exist_ok=True)
    with h5py.File(dataset_path, "r") as f:
        demos = sorted(f["data"].keys())[:n_demos]
        for demo in demos:
            g = f["data"][demo]
            acts = np.asarray(g["actions"], np.float32)
            n = len(acts)
            if n < t:
                continue
            # build sliding windows of obs and predict each step
            preds = []
            for i in range(t, n):
                obs = {}
                ok = True
                for k in model.obs_shapes:
                    if k == "lang_emb":
                        obs[k] = np.zeros(
                            (1, t) + tuple(model.obs_shapes[k]), np.float32
                        )
                        continue
                    if k not in g["obs"]:
                        ok = False
                        break
                    obs[k] = np.asarray(
                        g["obs"][k][i - t:i], np.float32
                    )[None]
                if not ok:
                    break
                ctx = {
                    "obs": obs,
                    "actions": acts[i - t:i][None],
                }
                a = np.asarray(model.get_action(obs, ctx))[0]
                preds.append(a)
            if not preds:
                continue
            preds = np.stack(preds)
            actual = acts[t:t + len(preds)]
            d = min(preds.shape[1], actual.shape[1])
            fig, axes = plt.subplots(d, 1, figsize=(8, 1.6 * d), sharex=True)
            if d == 1:
                axes = [axes]
            for dim in range(d):
                axes[dim].plot(actual[:, dim], label="actual", lw=1)
                axes[dim].plot(preds[:, dim], label="predicted", lw=1)
                axes[dim].set_ylabel(f"a[{dim}]")
            axes[0].legend(loc="upper right")
            axes[-1].set_xlabel("step")
            fig.suptitle(f"{demo}: predicted vs actual actions")
            path = os.path.join(output_dir, f"{demo}_predictions.png")
            fig.tight_layout()
            fig.savefig(path, dpi=80)
            plt.close(fig)
            out_paths.append(path)
    return out_paths


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--n_demos", type=int, default=2)
    args = parser.parse_args()
    paths = plot_predictions(args.ckpt, args.dataset, args.output,
                             args.n_demos)
    print(f"wrote {len(paths)} plots to {args.output}")


if __name__ == "__main__":
    main()
