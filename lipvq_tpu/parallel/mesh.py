"""Device mesh construction + sharding rules.

TPU-native replacement for the reference's single-GPU execution model
(SURVEY.md §2.5): a ``jax.sharding.Mesh`` with a ``data`` axis (DP over
batch — the only parallelism the workload needs at reference scale) plus
an optional ``model`` axis kept plumbed for codebook/embed sharding
headroom. Batches shard on their leading axis; parameters replicate.
XLA/GSPMD inserts the gradient psums.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_axis: int = 1,
              devices=None) -> Mesh:
    """Mesh with axes (data, model); model_axis=1 → pure DP."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % model_axis == 0
    grid = devices.reshape(n_devices // model_axis, model_axis)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put every leaf with leading-axis data sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, r), tree)
