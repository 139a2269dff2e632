"""Shared machinery for the offline-RL family (BCQ/CQL/IQL/TD3-BC).

The reference implements each algorithm with its own optimizer dict and
target-network copies (reference algo/{bcq,cql,iql,td3_bc}.py); here the
shared pieces — multi-network TrainState with target params, polyak
updates, single-step batch preparation — are factored once, and each
algorithm defines one jitted update over the whole state.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RLState(NamedTuple):
    step: jax.Array
    params: Any          # dict of net-name -> params
    target_params: Any   # dict of net-name -> params (subset)
    opt_state: Any       # dict of net-name -> optax state
    rng: jax.Array


def polyak(target, online, tau: float):
    return jax.tree.map(lambda t, o: (1.0 - tau) * t + tau * o, target, online)


def process_rl_batch(batch, n_step: int = 1, discount: float = 0.99,
                     infinite_horizon: bool = False):
    """Single-transition batch from sequence windows (reference
    bcq.py/td3_bc.py process_batch_for_training: obs at t=0, next_obs at
    t=n_step-1, reward = discounted sum over the window)."""
    out = {}
    out["obs"] = {k: np.asarray(v)[:, 0] for k, v in batch["obs"].items()}
    assert "next_obs" in batch, (
        "offline RL needs next_obs: set train.hdf5_load_next_obs=true"
    )
    out["next_obs"] = {
        k: np.asarray(v)[:, n_step - 1] for k, v in batch["next_obs"].items()
    }
    out["actions"] = np.asarray(batch["actions"])[:, 0]
    rewards = np.asarray(batch["rewards"])[:, :n_step].astype(np.float32)
    discounts = discount ** np.arange(n_step, dtype=np.float32)
    out["rewards"] = (rewards * discounts[None]).sum(axis=1)
    dones = np.asarray(batch["dones"])[:, n_step - 1].astype(np.float32)
    out["dones"] = dones
    if infinite_horizon:
        out["rewards"] = out["rewards"] + dones * (
            discount**n_step / (1.0 - discount)
        ) * rewards[:, -1]
    out["goal_obs"] = batch.get("goal_obs", None)
    return out


def td_target(rewards, dones, next_value, discount: float, n_step: int = 1):
    return rewards + (1.0 - dones) * (discount**n_step) * next_value


def huber(x, delta: float = 1.0):
    absx = jnp.abs(x)
    return jnp.where(absx <= delta, 0.5 * x**2, delta * (absx - 0.5 * delta))
