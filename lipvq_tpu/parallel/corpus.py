"""Offline corpus tokenization — pjit-sharded encode->quantize over a full
robomimic HDF5 corpus (SURVEY.md §7 Phase 1.5; the BASELINE.json v5e-8
>=50x target).

Pipeline: host reads action trajectories demo-by-demo -> concatenated
[N, action_dim] corpus -> padded to a multiple of (devices * block) ->
device_put with leading-axis data sharding -> one jitted
encode+VQ-lookup over the mesh (the fused Pallas kernel per shard) ->
token ids gathered to host -> written back per-demo to
``tokens/<name>`` datasets in the HDF5.
"""

from __future__ import annotations

import time

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE
from lipvq_tpu.parallel.mesh import batch_sharding, make_mesh, replicate


def tokenize_array(
    model: LipVQVAE,
    variables,
    actions: np.ndarray,
    mesh=None,
    chunk: int = 1 << 16,
) -> np.ndarray:
    """actions [N, A] -> token ids [N] int32, sharded over the mesh."""
    if mesh is None:
        mesh = make_mesh()
    n = actions.shape[0]
    n_dev = mesh.devices.size
    pad_to = max(chunk, ((n + n_dev - 1) // n_dev) * n_dev)
    padded = np.zeros((pad_to, actions.shape[1]), np.float32)
    padded[:n] = actions
    variables = replicate(mesh, variables)

    @jax.jit
    def _tokenize(v, x):
        return model.apply(v, x, method=LipVQVAE.tokenize)

    x = jax.device_put(jnp.asarray(padded), batch_sharding(mesh))
    ids = _tokenize(variables, x)
    return np.asarray(ids)[:n]


def tokenize_hdf5_corpus(
    model: LipVQVAE,
    variables,
    dataset_paths: list[str],
    output_key: str = "lipvq_tokens",
    action_key: str = "actions",
    mesh=None,
    write: bool = True,
) -> dict:
    """Tokenize every demo's actions across one or more HDF5 files.

    Returns timing/throughput stats; when ``write``, token ids are stored
    at ``data/<demo>/tokens/<output_key>``.
    """
    if mesh is None:
        mesh = make_mesh()
    stats = {"files": 0, "demos": 0, "chunks": 0, "seconds": 0.0}
    for path in dataset_paths:
        mode = "r+" if write else "r"
        with h5py.File(path, mode) as f:
            demos = sorted(f["data"].keys(), key=lambda e: int(e[5:]))
            arrays, spans = [], []
            offset = 0
            for ep in demos:
                a = np.asarray(f[f"data/{ep}/{action_key}"], np.float32)
                arrays.append(a)
                spans.append((ep, offset, offset + a.shape[0]))
                offset += a.shape[0]
            corpus = np.concatenate(arrays, axis=0)

            t0 = time.time()
            ids = tokenize_array(model, variables, corpus, mesh=mesh)
            ids = np.asarray(jax.block_until_ready(jnp.asarray(ids)))
            dt = time.time() - t0

            if write:
                for ep, lo, hi in spans:
                    key = f"data/{ep}/tokens/{output_key}"
                    if key in f:
                        del f[key]
                    f.create_dataset(key, data=ids[lo:hi])
            stats["files"] += 1
            stats["demos"] += len(demos)
            stats["chunks"] += corpus.shape[0]
            stats["seconds"] += dt
    stats["chunks_per_sec"] = stats["chunks"] / max(stats["seconds"], 1e-9)
    return stats
