"""IQL — Implicit Q-Learning (Kostrikov et al. 2021).

Counterpart of reference algo/iql.py (427 LoC):
- twin Q critics trained on TD targets bootstrapped through V
  (iql.py:174-236)
- V trained by expectile regression toward min-target-Q
  (iql.py:224-227, vf_quantile)
- actor trained by advantage-weighted regression:
  weights = exp(adv / beta), optionally value-clipped then
  final-clipped to [-100, 100] (iql.py:330-355)
- polyak target updates each step (iql.py:399)
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
from lipvq_tpu.models.distributions import gmm_log_prob, gmm_sample
from lipvq_tpu.models.obs_nets import obs_spec
from lipvq_tpu.models.policy_nets import GMMActorNetwork
from lipvq_tpu.models.value_nets import QEnsemble, ValueNetwork


@register_algo_factory_func("iql")
def algo_config_to_class(algo_config):
    return IQL, {}


class IQL(PolicyAlgo):
    def _create_networks(self):
        ac = self.algo_config
        spec = obs_spec(self.obs_shapes)
        self.group_specs = (("obs", spec),)
        actor_type = str(ac.actor.net.type)
        num_modes = int(ac.actor.net.gmm.num_modes) if actor_type == "gmm" else 1
        self.actor = GMMActorNetwork(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            layer_dims=tuple(ac.actor.layer_dims),
            num_modes=num_modes,
            min_std=float(ac.actor.net.gmm.get("min_std", 1e-4)),
            std_activation=str(ac.actor.net.common.std_activation),
            low_noise_eval=bool(ac.actor.net.common.low_noise_eval),
            use_tanh=bool(ac.actor.net.common.use_tanh),
        )
        self.critic = QEnsemble(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            n=int(ac.critic.ensemble.n),
            layer_dims=tuple(ac.critic.layer_dims),
        )
        self.vf = ValueNetwork(
            group_specs=self.group_specs,
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
                {"params": jax.random.PRNGKey(seed),
                 "dropout": jax.random.PRNGKey(seed)},
                dummy_obs, method=GMMActorNetwork.forward_train,
            )["params"],
            "critic": self.critic.init(
                jax.random.PRNGKey(seed + 1), dummy_obs, dummy_act
            )["params"],
            "vf": self.vf.init(jax.random.PRNGKey(seed + 2), dummy_obs)["params"],
        }

    def _create_optimizers(self):
        ac = self.algo_config
        self.discount = float(ac.discount)
        self.tau = float(ac.target_tau)
        self.vf_quantile = float(ac.vf_quantile)
        self.beta = float(ac.adv.beta)
        self.clip_adv_value = ac.adv.clip_adv_value
        self.use_final_clip = bool(ac.adv.use_final_clip)
        self.tx = {
            "actor": optimizer_from_optim_params(ac.optim_params.actor),
            "critic": optimizer_from_optim_params(ac.optim_params.critic),
            "vf": optimizer_from_optim_params(ac.optim_params.vf),
        }
        seed = int(self.global_config.train.seed)
        self.state = RLState(
            step=jnp.zeros((), jnp.int32),
            params=self._params,
            target_params={"critic": jax.tree.map(
                jnp.copy, self._params["critic"])},
            opt_state={k: self.tx[k].init(self._params[k]) for k in self.tx},
            rng=jax.random.PRNGKey(seed + 3),
        )
        self._jit_step = jax.jit(self._train_step_impl)
        self._jit_act = jax.jit(self._act_impl)

    def process_batch_for_training(self, batch):
        return process_rl_batch(batch, discount=self.discount)

    def _train_step_impl(self, state: RLState, batch):
        rng, drop_key = jax.random.split(state.rng)

        # --- critic: TD target through V(s') ---
        def critic_loss_fn(critic_params):
            v_next = self.vf.apply(
                {"params": state.params["vf"]}, batch["next_obs"]
            )
            target = td_target(
                batch["rewards"], batch["dones"], v_next, self.discount
            )
            q = self.critic.apply(
                {"params": critic_params}, batch["obs"], batch["actions"]
            )
            return jnp.mean((q - jax.lax.stop_gradient(target)[None]) ** 2)

        # --- V: expectile regression toward min target-Q ---
        q_t = self.critic.apply(
            {"params": state.target_params["critic"]}, batch["obs"],
            batch["actions"],
        )
        q_min = jnp.min(q_t, axis=0)

        def vf_loss_fn(vf_params):
            v = self.vf.apply({"params": vf_params}, batch["obs"])
            diff = q_min - v
            sign = (diff > 0).astype(jnp.float32)
            weight = (1 - sign) * (1 - self.vf_quantile) + sign * self.vf_quantile
            return jnp.mean(weight * diff**2)

        # --- actor: AWR ---
        v = self.vf.apply({"params": state.params["vf"]}, batch["obs"])
        adv = q_min - v
        if self.clip_adv_value is not None:
            adv = jnp.clip(adv, None, float(self.clip_adv_value))
        weights = jnp.exp(adv / self.beta)
        if self.use_final_clip:
            weights = jnp.clip(weights, -100.0, 100.0)
        weights = jax.lax.stop_gradient(weights)

        def actor_loss_fn(actor_params):
            dists = self.actor.apply(
                {"params": actor_params}, batch["obs"], train=True,
                rngs={"dropout": drop_key},
                method=GMMActorNetwork.forward_train,
            )
            lp = gmm_log_prob(dists, batch["actions"])
            return jnp.mean(-lp * weights)

        losses, grads, new_params, new_opt = {}, {}, {}, {}
        for name, fn in (
            ("critic", critic_loss_fn), ("vf", vf_loss_fn),
            ("actor", actor_loss_fn),
        ):
            losses[name], grads[name] = jax.value_and_grad(fn)(
                state.params[name]
            )
            up, new_opt[name] = self.tx[name].update(
                grads[name], state.opt_state[name], state.params[name]
            )
            new_params[name] = optax.apply_updates(state.params[name], up)

        target = {
            "critic": polyak(
                state.target_params["critic"], new_params["critic"], self.tau
            )
        }
        new_state = RLState(
            step=state.step + 1, params=new_params, target_params=target,
            opt_state=new_opt, rng=rng,
        )
        return new_state, {
            "critic_loss": losses["critic"], "vf_loss": losses["vf"],
            "actor_loss": losses["actor"], "action_loss": losses["actor"],
            "adv_mean": jnp.mean(adv),
        }

    def train_on_batch(self, batch, epoch, validate: bool = False):
        batch = self._put_batch(batch)
        if validate:
            # losses only, no update (reference validates with no_grad)
            state, metrics = self._jit_step(self.state, batch)
            return {"losses": metrics}
        self.state, metrics = self._jit_step(self.state, batch)
        return {"losses": metrics}

    def log_info(self, info):
        return {
            "Loss": float(info["losses"]["action_loss"]),
            "Critic_Loss": float(info["losses"]["critic_loss"]),
            "VF_Loss": float(info["losses"]["vf_loss"]),
            "Actor_Loss": float(info["losses"]["actor_loss"]),
            "Adv_Mean": float(info["losses"]["adv_mean"]),
        }

    def _act_impl(self, params, obs, key):
        dists = self.actor.apply(
            {"params": params["actor"]}, obs, train=False,
            rngs={"dropout": key}, method=GMMActorNetwork.forward_train,
        )
        return gmm_sample(dists, key)

    def get_action(self, obs_dict, goal_dict=None):
        rng, key = jax.random.split(self.state.rng)
        self.state = self.state._replace(rng=rng)
        obs = jax.tree.map(jnp.asarray, obs_dict)
        obs = {
            k: v[:, -1] if v.ndim > 1 + len(self.obs_shapes[k]) else v
            for k, v in obs.items()
        }
        return np.asarray(self._jit_act(self.state.params, obs, key))

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
