"""CQL — Conservative Q-Learning (Kumar et al. 2020).

Counterpart of reference algo/cql.py (668 LoC): SAC backbone
(tanh-Gaussian actor, twin Q, automatic entropy temperature) plus the
conservative penalty
    E_s[ logsumexp_a Q(s, a) - Q(s, a_data) ]
estimated over random + policy + next-policy action samples, with
optional Lagrange threshold. Config defaults per reference cql_config.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lipvq_tpu.algo.base import (
    PolicyAlgo,
    optimizer_from_optim_params,
    register_algo_factory_func,
)
from lipvq_tpu.algo.rl_common import RLState, polyak, process_rl_batch, td_target
from lipvq_tpu.models.base_nets import MLP, TorchLinear
from lipvq_tpu.models.obs_nets import ObservationGroupEncoder, obs_spec
from lipvq_tpu.models.value_nets import QEnsemble

from flax import linen as nn


@register_algo_factory_func("cql")
def algo_config_to_class(algo_config):
    return CQL, {}


class TanhGaussianActor(nn.Module):
    group_specs: tuple
    ac_dim: int
    layer_dims: tuple = (300, 400)

    @nn.compact
    def __call__(self, obs, key, train: bool = False):
        """-> (action in [-1,1], log_prob)."""
        enc = ObservationGroupEncoder(self.group_specs, name="enc")
        h = enc(train=train, obs=obs)
        h = MLP(self.layer_dims, self.layer_dims[-1], activation="relu",
                name="mlp")(h)
        mu = TorchLinear(self.ac_dim, name="mu")(h)
        log_std = jnp.clip(TorchLinear(self.ac_dim, name="log_std")(h), -5, 2)
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mu.shape)
        pre_tanh = mu + std * eps
        a = jnp.tanh(pre_tanh)
        lp = -0.5 * (((pre_tanh - mu) / std) ** 2 + 2 * log_std
                     + jnp.log(2 * jnp.pi))
        lp = jnp.sum(lp, axis=-1) - jnp.sum(
            jnp.log(1 - a**2 + 1e-6), axis=-1
        )
        return a, lp


class CQL(PolicyAlgo):
    def _create_networks(self):
        ac = self.algo_config
        spec = obs_spec(self.obs_shapes)
        self.group_specs = (("obs", spec),)
        self.actor = TanhGaussianActor(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            layer_dims=tuple(ac.actor.layer_dims),
        )
        self.critic = QEnsemble(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            n=int(ac.critic.ensemble.n),
            layer_dims=tuple(ac.critic.layer_dims),
        )
        seed = int(self.global_config.train.seed)
        dummy_obs = {
            k: jnp.zeros((2,) + tuple(s), jnp.float32)
            for k, s in self.obs_shapes.items()
        }
        dummy_act = jnp.zeros((2, self.ac_dim), jnp.float32)
        self._params = {
            "actor": self.actor.init(
                jax.random.PRNGKey(seed), dummy_obs, jax.random.PRNGKey(0)
            )["params"],
            "critic": self.critic.init(
                jax.random.PRNGKey(seed + 1), dummy_obs, dummy_act
            )["params"],
            "log_alpha": jnp.zeros(()),
        }

    def _create_optimizers(self):
        ac = self.algo_config
        self.discount = float(ac.discount)
        self.tau = float(ac.target_tau)
        self.cql_weight = float(ac.critic.get("cql_weight", 1.0))
        self.num_rand = int(ac.critic.get("num_random_actions", 10))
        self.target_entropy = -float(self.ac_dim)
        self.tx = {
            "actor": optimizer_from_optim_params(ac.optim_params.actor),
            "critic": optimizer_from_optim_params(ac.optim_params.critic),
            "log_alpha": optax.adam(1e-3),
        }
        seed = int(self.global_config.train.seed)
        self.state = RLState(
            step=jnp.zeros((), jnp.int32),
            params=self._params,
            target_params={"critic": jax.tree.map(
                jnp.copy, self._params["critic"])},
            opt_state={k: self.tx[k].init(self._params[k]) for k in self.tx},
            rng=jax.random.PRNGKey(seed + 2),
        )
        self._jit_step = jax.jit(self._train_step_impl)
        self._jit_act = jax.jit(
            lambda p, obs, key: self.actor.apply({"params": p}, obs, key)[0]
        )

    def process_batch_for_training(self, batch):
        return process_rl_batch(batch, discount=self.discount)

    def _q(self, critic_params, obs, act):
        return self.critic.apply({"params": critic_params}, obs, act)

    def _train_step_impl(self, state: RLState, batch):
        rng, k1, k2, k3, k4 = jax.random.split(state.rng, 5)
        b = batch["actions"].shape[0]
        alpha = jnp.exp(state.params["log_alpha"])

        # --- critic + CQL penalty ---
        next_a, next_lp = self.actor.apply(
            {"params": state.params["actor"]}, batch["next_obs"], k1
        )
        q_next = self._q(state.target_params["critic"], batch["next_obs"],
                         next_a)
        target = td_target(
            batch["rewards"], batch["dones"],
            jnp.min(q_next, axis=0) - alpha * next_lp, self.discount,
        )

        def critic_loss_fn(critic_params):
            q_data = self._q(critic_params, batch["obs"], batch["actions"])
            bellman = jnp.mean(
                (q_data - jax.lax.stop_gradient(target)[None]) ** 2
            )
            # penalty samples: uniform random + policy actions
            rand_a = jax.random.uniform(
                k2, (self.num_rand, b, self.ac_dim), minval=-1.0, maxval=1.0
            )
            pi_a, pi_lp = self.actor.apply(
                {"params": state.params["actor"]}, batch["obs"], k3
            )
            q_rand = jnp.stack(
                [self._q(critic_params, batch["obs"], rand_a[i])
                 for i in range(self.num_rand)],
                axis=0,
            )  # [num_rand, n_q, B]
            q_pi = self._q(critic_params, batch["obs"], pi_a)[None]
            # importance-weighted logsumexp (reference cql penalty)
            log_u = -jnp.log(0.5**self.ac_dim)
            cat = jnp.concatenate(
                [q_rand + log_u, q_pi - pi_lp[None, None]], axis=0
            )
            lse = jax.nn.logsumexp(cat, axis=0)  # [n_q, B]
            penalty = jnp.mean(lse - q_data)
            return bellman + self.cql_weight * penalty, (bellman, penalty)

        (c_loss, (bellman, penalty)), c_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(state.params["critic"])

        # --- actor (SAC) ---
        def actor_loss_fn(actor_params):
            a, lp = self.actor.apply({"params": actor_params}, batch["obs"], k4)
            q = jnp.min(self._q(state.params["critic"], batch["obs"], a),
                        axis=0)
            return jnp.mean(alpha * lp - q), lp

        (a_loss, lp), a_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True
        )(state.params["actor"])

        # --- temperature ---
        def alpha_loss_fn(log_alpha):
            return -jnp.mean(
                jnp.exp(log_alpha)
                * jax.lax.stop_gradient(lp + self.target_entropy)
            )

        al_loss, al_grad = jax.value_and_grad(alpha_loss_fn)(
            state.params["log_alpha"]
        )

        new_params, new_opt = {}, {}
        for name, grads in (
            ("critic", c_grads), ("actor", a_grads), ("log_alpha", al_grad),
        ):
            up, new_opt[name] = self.tx[name].update(
                grads, state.opt_state[name], state.params[name]
            )
            new_params[name] = optax.apply_updates(state.params[name], up)

        target_params = {
            "critic": polyak(
                state.target_params["critic"], new_params["critic"], self.tau
            )
        }
        new_state = RLState(
            step=state.step + 1, params=new_params,
            target_params=target_params, opt_state=new_opt, rng=rng,
        )
        return new_state, {
            "critic_loss": c_loss, "bellman_loss": bellman,
            "cql_penalty": penalty, "actor_loss": a_loss,
            "alpha_loss": al_loss, "action_loss": a_loss,
        }

    def train_on_batch(self, batch, epoch, validate: bool = False):
        batch = self._put_batch(batch)
        if validate:
            # losses only — discard the updated state (no param movement)
            _, metrics = self._jit_step(self.state, batch)
            return {"losses": metrics}
        self.state, metrics = self._jit_step(self.state, batch)
        return {"losses": metrics}

    def log_info(self, info):
        return {
            "Loss": float(info["losses"]["action_loss"]),
            "Critic_Loss": float(info["losses"]["critic_loss"]),
            "CQL_Penalty": float(info["losses"]["cql_penalty"]),
            "Actor_Loss": float(info["losses"]["actor_loss"]),
        }

    def get_action(self, obs_dict, goal_dict=None):
        rng, key = jax.random.split(self.state.rng)
        self.state = self.state._replace(rng=rng)
        obs = jax.tree.map(jnp.asarray, obs_dict)
        obs = {
            k: v[:, -1] if v.ndim > 1 + len(self.obs_shapes[k]) else v
            for k, v in obs.items()
        }
        return np.asarray(self._jit_act(self.state.params["actor"], obs, key))

    def serialize(self):
        from flax import serialization

        return serialization.to_bytes(
            {"params": self.state.params,
             "target_params": self.state.target_params}
        )

    def deserialize(self, payload):
        from flax import serialization

        template = {"params": self.state.params,
                    "target_params": self.state.target_params}
        restored = serialization.from_bytes(template, payload)
        self.state = self.state._replace(
            params=restored["params"], target_params=restored["target_params"]
        )
