"""Value networks (flax).

Counterpart of reference models/value_nets.py: ``ValueNetwork`` V(s) and
``ActionValueNetwork`` Q(s, a) as obs-encoder + MLP heads, with optional
output value bounds (reference value_nets.py ValueNetwork/
DistributionalActionValueNetwork — the distributional variant is omitted
until a config needs it).
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import MLP, TorchLinear
from lipvq_tpu.models.obs_nets import ObservationGroupEncoder, ObsSpec


class ValueNetwork(nn.Module):
    group_specs: ObsSpec
    layer_dims: Sequence[int] = (300, 400)
    value_bounds: tuple | None = None
    encoder_cores: ObsSpec = ()

    @nn.compact
    def __call__(self, obs, goal=None, train: bool = False):
        enc = ObservationGroupEncoder(
            self.group_specs, encoder_cores=self.encoder_cores, name="enc"
        )
        groups = {"obs": obs}
        if goal is not None:
            groups["goal"] = goal
        h = enc(train=train, **groups)
        h = MLP(self.layer_dims, self.layer_dims[-1], activation="relu",
                name="mlp")(h)
        v = TorchLinear(1, name="out")(h)[..., 0]
        if self.value_bounds is not None:
            lo, hi = self.value_bounds
            v = lo + (hi - lo) * jax.nn.sigmoid(v)
        return v


class ActionValueNetwork(nn.Module):
    """Q(s, a): action concatenated to obs features
    (reference value_nets.py ActionValueNetwork)."""

    group_specs: ObsSpec
    ac_dim: int
    layer_dims: Sequence[int] = (300, 400)
    value_bounds: tuple | None = None
    encoder_cores: ObsSpec = ()

    @nn.compact
    def __call__(self, obs, actions, goal=None, train: bool = False):
        enc = ObservationGroupEncoder(
            self.group_specs, encoder_cores=self.encoder_cores, name="enc"
        )
        groups = {"obs": obs}
        if goal is not None:
            groups["goal"] = goal
        h = enc(train=train, **groups)
        h = jnp.concatenate([h, actions], axis=-1)
        h = MLP(self.layer_dims, self.layer_dims[-1], activation="relu",
                name="mlp")(h)
        q = TorchLinear(1, name="out")(h)[..., 0]
        if self.value_bounds is not None:
            lo, hi = self.value_bounds
            q = lo + (hi - lo) * jax.nn.sigmoid(q)
        return q


class DistributionalActionValueNetwork(nn.Module):
    """Categorical (C51-style) Q(s, a) over fixed value atoms
    (reference value_nets.py DistributionalActionValueNetwork — used by
    BCQ's distributional critic option): outputs per-atom logits; the
    scalar value is the probability-weighted atom sum."""

    group_specs: ObsSpec
    ac_dim: int
    num_atoms: int = 51
    value_bounds: tuple = (-1.0, 200.0)
    layer_dims: Sequence[int] = (300, 400)
    encoder_cores: ObsSpec = ()

    @nn.compact
    def __call__(self, obs, actions, goal=None, train: bool = False,
                 return_logits: bool = False):
        enc = ObservationGroupEncoder(
            self.group_specs, encoder_cores=self.encoder_cores, name="enc"
        )
        groups = {"obs": obs}
        if goal is not None:
            groups["goal"] = goal
        h = enc(train=train, **groups)
        h = jnp.concatenate([h, actions], axis=-1)
        h = MLP(self.layer_dims, self.layer_dims[-1], activation="relu",
                name="mlp")(h)
        logits = TorchLinear(self.num_atoms, name="out")(h)
        if return_logits:
            return logits
        atoms = jnp.linspace(
            self.value_bounds[0], self.value_bounds[1], self.num_atoms
        )
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.sum(probs * atoms[None], axis=-1)

    @property
    def atoms(self):
        import numpy as np

        return np.linspace(
            self.value_bounds[0], self.value_bounds[1], self.num_atoms
        )


class QEnsemble(nn.Module):
    """n independent Q networks evaluated together."""

    group_specs: ObsSpec
    ac_dim: int
    n: int = 2
    layer_dims: Sequence[int] = (300, 400)
    value_bounds: tuple | None = None
    encoder_cores: ObsSpec = ()

    @nn.compact
    def __call__(self, obs, actions, goal=None, train: bool = False):
        qs = []
        for i in range(self.n):
            qs.append(
                ActionValueNetwork(
                    self.group_specs, self.ac_dim, self.layer_dims,
                    self.value_bounds, self.encoder_cores, name=f"q{i}",
                )(obs, actions, goal=goal, train=train)
            )
        return jnp.stack(qs, axis=0)  # [n, B]
