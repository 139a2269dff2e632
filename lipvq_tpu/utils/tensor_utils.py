"""Nested-dict tensor utilities (JAX/numpy).

Counterpart of the reference's tensor_utils
(reference: robomimic/utils/tensor_utils.py). In JAX most of the
reference's ``time_distributed`` machinery disappears — modules are pure
functions and reshapes are free under jit — so only the nested-container
helpers that the data/algo layers actually use are provided.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable

import jax
import jax.numpy as jnp
import numpy as np


def map_tensor(x, fn: Callable):
    """Apply ``fn`` to every array leaf of a nested dict/list/tuple."""
    return jax.tree.map(fn, x)


def to_float32(x):
    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "astype") and jnp.issubdtype(np.asarray(a).dtype, np.floating)
        else a,
        x,
    )


def to_numpy(x):
    return jax.tree.map(np.asarray, x)


def to_jax(x):
    return jax.tree.map(jnp.asarray, x)


def detach(x):
    return jax.tree.map(jax.lax.stop_gradient, x)


def index_at_time(x, t: int):
    """Slice every [B, T, ...] leaf at time ``t`` -> [B, ...]."""
    return jax.tree.map(lambda a: a[:, t], x)


def slice_time(x, start: int, end: int):
    """Slice every [B, T, ...] leaf to [B, end-start, ...]."""
    return jax.tree.map(lambda a: a[:, start:end], x)


def join_dimensions(x, begin: int = 0, end: int = 1):
    """Merge dims [begin..end] of every leaf (reference join_dimensions)."""

    def _join(a):
        shape = a.shape
        new = shape[:begin] + (-1,) + shape[end + 1:]
        return a.reshape(new)

    return jax.tree.map(_join, x)


def reshape_dimensions(x, begin_axis: int, end_axis: int, target_dims):
    """Expand dims [begin..end] of every leaf into ``target_dims``."""

    def _reshape(a):
        shape = a.shape
        new = shape[:begin_axis] + tuple(target_dims) + shape[end_axis + 1:]
        return a.reshape(new)

    return jax.tree.map(_reshape, x)


def unsqueeze_expand_at(x, size: int, dim: int):
    """Insert a new axis at ``dim`` and tile it ``size`` times."""

    def _expand(a):
        a = jnp.expand_dims(a, dim)
        reps = [1] * a.ndim
        reps[dim] = size
        return jnp.tile(a, reps)

    return jax.tree.map(_expand, x)


def pad_sequence_single(seq: np.ndarray, padding: tuple[int, int],
                        pad_same: bool = True, pad_values=0.0) -> np.ndarray:
    """Pad a [T, ...] array at the front/back of the time axis
    (reference pad_sequence semantics: repeat edge frames or constant)."""
    front, back = padding
    parts = []
    if front > 0:
        pad = np.repeat(seq[0:1], front, axis=0) if pad_same else np.full(
            (front,) + seq.shape[1:], pad_values, dtype=seq.dtype
        )
        parts.append(pad)
    parts.append(seq)
    if back > 0:
        pad = np.repeat(seq[-1:], back, axis=0) if pad_same else np.full(
            (back,) + seq.shape[1:], pad_values, dtype=seq.dtype
        )
        parts.append(pad)
    return np.concatenate(parts, axis=0) if len(parts) > 1 else seq


def assert_size_at_dim(x, size: int, dim: int, msg: str = ""):
    for path, leaf in jax.tree.leaves_with_path(x):
        if leaf.shape[dim] != size:
            raise ValueError(f"{msg} (got {leaf.shape} at {path})")


def flatten_leading(x, n: int = 2):
    """[B, T, ...] -> [B*T, ...] for every leaf."""
    return jax.tree.map(lambda a: a.reshape((-1,) + a.shape[n:]), x)


def unflatten_leading(x, b: int, t: int):
    """[B*T, ...] -> [B, T, ...] for every leaf."""
    return jax.tree.map(lambda a: a.reshape((b, t) + a.shape[1:]), x)


def stack_collate(items: list[dict]) -> dict:
    """Collate a list of nested sample dicts into batched arrays."""
    out: dict = OrderedDict()
    first = items[0]
    for k, v in first.items():
        if isinstance(v, dict):
            out[k] = stack_collate([it[k] for it in items])
        elif v is None:
            out[k] = None
        else:
            out[k] = np.stack([np.asarray(it[k]) for it in items], axis=0)
    return out
