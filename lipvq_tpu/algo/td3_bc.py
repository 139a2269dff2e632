"""TD3-BC (Fujimoto & Gu 2021).

Counterpart of reference algo/td3_bc.py (567 LoC): twin-Q critics with
target policy smoothing, delayed deterministic actor updated with
lambda * Q / |Q| - BC-MSE, polyak target updates. Config defaults per
reference td3_bc_config.py (alpha 2.5, tau 0.005, actor update_freq 2,
smoothing noise 0.2 clipped 0.5).
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
from lipvq_tpu.algo.rl_common import (
    RLState,
    huber,
    polyak,
    process_rl_batch,
    td_target,
)
from lipvq_tpu.models.obs_nets import obs_spec
from lipvq_tpu.models.policy_nets import ActorNetwork
from lipvq_tpu.models.value_nets import QEnsemble


@register_algo_factory_func("td3_bc")
def algo_config_to_class(algo_config):
    return TD3_BC, {}


class TD3_BC(PolicyAlgo):
    def _create_networks(self):
        ac = self.algo_config
        spec = obs_spec(self.obs_shapes)
        self.group_specs = (("obs", spec),)
        self.actor = ActorNetwork(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            layer_dims=tuple(ac.actor.layer_dims),
        )
        self.critic = QEnsemble(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            n=int(ac.critic.ensemble.n),
            layer_dims=tuple(ac.critic.layer_dims),
            value_bounds=tuple(ac.critic.value_bounds)
            if ac.critic.value_bounds else None,
        )
        seed = int(self.global_config.train.seed)
        dummy_obs = {
            k: jnp.zeros((2,) + tuple(s), jnp.float32)
            for k, s in self.obs_shapes.items()
        }
        dummy_act = jnp.zeros((2, self.ac_dim), jnp.float32)
        actor_params = self.actor.init(
            jax.random.PRNGKey(seed), dummy_obs)["params"]
        critic_params = self.critic.init(
            jax.random.PRNGKey(seed + 1), dummy_obs, dummy_act)["params"]
        self._params = {"actor": actor_params, "critic": critic_params}

    def _create_optimizers(self):
        ac = self.algo_config
        self.discount = float(ac.discount)
        self.n_step = int(ac.get("n_step", 1))
        self.tau = float(ac.target_tau)
        self.alpha = float(ac.alpha)
        self.actor_update_freq = int(ac.actor.update_freq)
        self.noise_std = float(ac.actor.noise_std)
        self.noise_clip = float(ac.actor.noise_clip)
        self.use_huber = bool(ac.critic.use_huber)
        self.infinite_horizon = bool(ac.get("infinite_horizon", False))

        self.tx = {
            "actor": optimizer_from_optim_params(ac.optim_params.actor),
            "critic": optimizer_from_optim_params(ac.optim_params.critic),
        }
        seed = int(self.global_config.train.seed)
        self.state = RLState(
            step=jnp.zeros((), jnp.int32),
            params=self._params,
            target_params=jax.tree.map(jnp.copy, self._params),
            opt_state={
                k: self.tx[k].init(self._params[k]) for k in self.tx
            },
            rng=jax.random.PRNGKey(seed + 2),
        )
        self._jit_step = jax.jit(self._train_step_impl)
        self._jit_val = jax.jit(self._val_step_impl)
        self._jit_act = jax.jit(
            lambda params, obs: self.actor.apply({"params": params}, obs)
        )

    def process_batch_for_training(self, batch):
        return process_rl_batch(
            batch, n_step=self.n_step, discount=self.discount,
            infinite_horizon=self.infinite_horizon,
        )

    # -- jitted update -----------------------------------------------------
    def _critic_loss(self, critic_params, state, batch, key):
        next_a = self.actor.apply(
            {"params": state.target_params["actor"]}, batch["next_obs"]
        )
        noise = jnp.clip(
            self.noise_std * jax.random.normal(key, next_a.shape),
            -self.noise_clip, self.noise_clip,
        )
        next_a = jnp.clip(next_a + noise, -1.0, 1.0)
        q_next = self.critic.apply(
            {"params": state.target_params["critic"]}, batch["next_obs"], next_a
        )
        q_target = td_target(
            batch["rewards"], batch["dones"], jnp.min(q_next, axis=0),
            self.discount, self.n_step,
        )
        q = self.critic.apply(
            {"params": critic_params}, batch["obs"], batch["actions"]
        )
        err = q - jax.lax.stop_gradient(q_target)[None]
        loss = jnp.mean(huber(err)) if self.use_huber else jnp.mean(err**2)
        return loss

    def _actor_loss(self, actor_params, critic_params, batch):
        pi = self.actor.apply({"params": actor_params}, batch["obs"])
        q = self.critic.apply(
            {"params": critic_params}, batch["obs"], pi
        )[0]
        lam = self.alpha / (jnp.abs(jax.lax.stop_gradient(q)).mean() + 1e-8)
        return -lam * q.mean() + jnp.mean((pi - batch["actions"]) ** 2)

    def _train_step_impl(self, state: RLState, batch):
        rng, noise_key = jax.random.split(state.rng)
        c_loss, c_grads = jax.value_and_grad(self._critic_loss)(
            state.params["critic"], state, batch, noise_key
        )
        c_up, c_opt = self.tx["critic"].update(
            c_grads, state.opt_state["critic"], state.params["critic"]
        )
        critic_params = optax.apply_updates(state.params["critic"], c_up)

        def do_actor(_):
            a_loss, a_grads = jax.value_and_grad(self._actor_loss)(
                state.params["actor"], critic_params, batch
            )
            a_up, a_opt = self.tx["actor"].update(
                a_grads, state.opt_state["actor"], state.params["actor"]
            )
            return optax.apply_updates(state.params["actor"], a_up), a_opt, a_loss

        def skip_actor(_):
            return state.params["actor"], state.opt_state["actor"], jnp.zeros(())

        do = (state.step % self.actor_update_freq) == 0
        actor_params, a_opt, a_loss = jax.lax.cond(do, do_actor, skip_actor, None)

        params = {"actor": actor_params, "critic": critic_params}
        target_params = polyak(state.target_params, params, self.tau)
        new_state = RLState(
            step=state.step + 1, params=params, target_params=target_params,
            opt_state={"actor": a_opt, "critic": c_opt}, rng=rng,
        )
        return new_state, {"critic_loss": c_loss, "actor_loss": a_loss,
                           "action_loss": c_loss}

    def _val_step_impl(self, state: RLState, batch):
        rng, noise_key = jax.random.split(state.rng)
        c_loss = self._critic_loss(state.params["critic"], state, batch,
                                   noise_key)
        a_loss = self._actor_loss(
            state.params["actor"], state.params["critic"], batch
        )
        return state._replace(rng=rng), {
            "critic_loss": c_loss, "actor_loss": a_loss, "action_loss": c_loss,
        }

    def train_on_batch(self, batch, epoch, validate: bool = False):
        batch = self._put_batch(batch)
        step = self._jit_val if validate else self._jit_step
        self.state, metrics = step(self.state, batch)
        return {"losses": metrics}

    def log_info(self, info):
        return {
            "Loss": float(info["losses"]["action_loss"]),
            "Critic_Loss": float(info["losses"]["critic_loss"]),
            "Actor_Loss": float(info["losses"]["actor_loss"]),
        }

    def get_action(self, obs_dict, goal_dict=None):
        obs = jax.tree.map(jnp.asarray, obs_dict)
        # single-step policies consume [B, ...]; strip a time axis if given
        obs = {
            k: v[:, -1] if v.ndim > 1 + len(self.obs_shapes[k]) else v
            for k, v in obs.items()
        }
        return np.asarray(self._jit_act(self.state.params["actor"], obs))

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
