"""Test harness utilities.

Counterpart of reference robomimic/utils/test_utils.py: small configs +
fixture datasets for smoke training. The reference downloads a real
10-demo HDF5 (test_utils.py:41-56); this environment is hermetic, so the
fixture is generated — same robomimic HDF5 schema (SURVEY.md A.1), with
smooth synthetic trajectories so learning signal exists.
"""

from __future__ import annotations

import json

import h5py
import numpy as np


def make_synthetic_dataset(
    path: str,
    n_demos: int = 10,
    demo_len: int = 40,
    action_dim: int = 12,
    obs_key_shapes: dict | None = None,
    lang: str = "pick the object and place it in the sink",
    seed: int = 0,
) -> str:
    """Write a robomimic-format HDF5 with smooth sinusoid trajectories."""
    obs_key_shapes = obs_key_shapes or {
        "robot0_eef_pos": (3,),
        "robot0_eef_quat": (4,),
        "robot0_gripper_qpos": (2,),
        "object": (14,),
    }
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        env_args = {
            "env_name": "SyntheticKitchen",
            "type": 1,
            "env_kwargs": {},
        }
        data.attrs["env_args"] = json.dumps(env_args)
        total = 0
        for d in range(n_demos):
            g = data.create_group(f"demo_{d}")
            t = np.arange(demo_len, dtype=np.float32)[:, None]
            phase = rng.uniform(0, 2 * np.pi, (1, action_dim)).astype(np.float32)
            freq = rng.uniform(0.05, 0.2, (1, action_dim)).astype(np.float32)
            actions = 0.8 * np.sin(freq * t + phase).astype(np.float32)
            g.create_dataset("actions", data=actions)
            g.create_dataset("rewards", data=np.zeros(demo_len, np.float32))
            g.create_dataset("dones", data=np.zeros(demo_len, np.float32))
            g.create_dataset(
                "states", data=rng.standard_normal((demo_len, 32)).astype(np.float32)
            )
            obs = g.create_group("obs")
            for k, shape in obs_key_shapes.items():
                ph = rng.uniform(0, 2 * np.pi, (1,) + tuple(shape)).astype(np.float32)
                fr = rng.uniform(0.05, 0.2, (1,) + tuple(shape)).astype(np.float32)
                tt = t.reshape((demo_len,) + (1,) * len(shape))
                obs.create_dataset(k, data=np.cos(fr * tt + ph).astype(np.float32))
            g.attrs["num_samples"] = demo_len
            g.attrs["ep_meta"] = json.dumps({"lang": lang})
            total += demo_len
        mask = f.create_group("mask")
        names = [f"demo_{d}".encode() for d in range(n_demos)]
        mask.create_dataset("train", data=np.array(names[: max(1, n_demos - 2)]))
        mask.create_dataset("valid", data=np.array(names[max(1, n_demos - 2):]))
        f["data"].attrs["total"] = total
    return path


def icl_test_config_overrides(debug_size: bool = True) -> dict:
    """Tiny ICL config for 3-step smoke trainings (reference
    test_utils.get_base_config:104-152)."""
    d = {
        "train": {
            "batch_size": 8,
            "seq_length": 10,
            "frame_stack": 10,
            "num_epochs": 1,
            "max_grad_norm": 100.0,
            "hdf5_cache_mode": "all",
        },
        "experiment": {
            "epoch_every_n_steps": 3,
            "validation_epoch_every_n_steps": 2,
            "validate": True,
            "rollout": {"enabled": False, "n": 1, "horizon": 10, "rate": 1},
            "save": {"enabled": True, "every_n_epochs": 1},
            "logging": {"terminal_output_to_txt": False, "log_tb": False},
        },
        "algo": {
            "gmm": {"enabled": True},
            "transformer": {
                "enabled": True,
                "supervise_all_steps": True,
                "pred_future_acs": True,
                "causal": False,
                "embed_dim": 64,
                "num_layers": 2,
                "num_heads": 4,
                "vq_vae_enabled": True,
                "ln_act_enabled": False,
            },
            "vq": {"num_codes": 32},
        },
        "observation": {
            "modalities": {
                "obs": {
                    "low_dim": [
                        "robot0_eef_pos",
                        "robot0_eef_quat",
                        "robot0_gripper_qpos",
                        "object",
                        "lang_emb",
                    ],
                    "rgb": [],
                }
            }
        },
    }
    return d
