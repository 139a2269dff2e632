"""BCQ — Batch-Constrained Q-Learning (Fujimoto et al. 2019).

Counterpart of reference algo/bcq.py (1,022 LoC):
- conditional action VAE sampler p(a|s) (reference action_sampler)
- optional perturbation actor xi(s, a) bounded by action_limit
- twin-Q critic; targets via sampling N VAE actions (+ perturbation) at
  s' and mixing min/max Q with ensemble weight lambda
  (reference bcq.py critic target construction)
- get_action: sample N candidates from the VAE, perturb, argmax Q
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flax import linen as nn

from lipvq_tpu.algo.base import (
    PolicyAlgo,
    optimizer_from_optim_params,
    register_algo_factory_func,
)
from lipvq_tpu.algo.rl_common import RLState, polyak, process_rl_batch, td_target
from lipvq_tpu.models.base_nets import MLP, TorchLinear
from lipvq_tpu.models.obs_nets import ObservationGroupEncoder, obs_spec
from lipvq_tpu.models.value_nets import QEnsemble
from lipvq_tpu.models.vae_nets import VAE


@register_algo_factory_func("bcq")
def algo_config_to_class(algo_config):
    return BCQ, {}


class _ActionVAE(nn.Module):
    group_specs: tuple
    ac_dim: int
    latent_dim: int
    layer_dims: tuple = (300, 400)

    def setup(self):
        self.enc = ObservationGroupEncoder(self.group_specs)
        self.vae = VAE(
            input_dim=self.ac_dim, latent_dim=self.latent_dim,
            encoder_layer_dims=self.layer_dims,
            decoder_layer_dims=self.layer_dims,
        )

    def __call__(self, obs, actions, train: bool = False):
        cond = self.enc(train=train, obs=obs)
        return self.vae(actions, cond=cond)

    def sample(self, obs, key, n: int = 1, train: bool = False):
        cond = self.enc(train=train, obs=obs)
        b = cond.shape[0]
        cond_rep = jnp.repeat(cond, n, axis=0)
        z = jax.random.normal(key, (b * n, self.vae.latent_dim))
        z = jnp.clip(z, -0.5, 0.5)  # reference clips prior samples
        a = self.vae.decode(z, cond_rep)
        return jnp.tanh(a)


class _Perturbation(nn.Module):
    group_specs: tuple
    ac_dim: int
    limit: float = 0.05
    layer_dims: tuple = (300, 400)

    @nn.compact
    def __call__(self, obs, actions, train: bool = False):
        enc = ObservationGroupEncoder(self.group_specs, name="enc")
        h = enc(train=train, obs=obs)
        h = jnp.concatenate([h, actions], axis=-1)
        h = MLP(self.layer_dims, self.layer_dims[-1], activation="relu",
                name="mlp")(h)
        delta = self.limit * jnp.tanh(TorchLinear(self.ac_dim, name="out")(h))
        return jnp.clip(actions + delta, -1.0, 1.0)


class BCQ(PolicyAlgo):
    def _create_networks(self):
        ac = self.algo_config
        spec = obs_spec(self.obs_shapes)
        self.group_specs = (("obs", spec),)
        latent_dim = int(ac.action_sampler.vae.get("latent_dim", 2 * self.ac_dim))
        self.sampler = _ActionVAE(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            latent_dim=latent_dim,
        )
        self.use_perturbation = bool(ac.actor.get("enabled", False))
        self.perturb = _Perturbation(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            limit=float(ac.actor.get("perturbation_scale", 0.05)),
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
            "sampler": self.sampler.init(
                {"params": jax.random.PRNGKey(seed),
                 "sample": jax.random.PRNGKey(seed)},
                dummy_obs, dummy_act,
            )["params"],
            "perturb": self.perturb.init(
                jax.random.PRNGKey(seed + 1), dummy_obs, dummy_act
            )["params"],
            "critic": self.critic.init(
                jax.random.PRNGKey(seed + 2), dummy_obs, dummy_act
            )["params"],
        }

    def _create_optimizers(self):
        ac = self.algo_config
        self.discount = float(ac.discount)
        self.tau = float(ac.target_tau)
        self.n_samples = int(ac.critic.get("num_action_samples", 10))
        self.ensemble_weight = float(ac.critic.ensemble.get("weight", 0.75))
        self.tx = {
            "sampler": optimizer_from_optim_params(ac.optim_params.action_sampler),
            "perturb": optimizer_from_optim_params(ac.optim_params.actor),
            "critic": optimizer_from_optim_params(ac.optim_params.critic),
        }
        seed = int(self.global_config.train.seed)
        self.state = RLState(
            step=jnp.zeros((), jnp.int32),
            params=self._params,
            target_params={
                "critic": jax.tree.map(jnp.copy, self._params["critic"]),
                "perturb": jax.tree.map(jnp.copy, self._params["perturb"]),
            },
            opt_state={k: self.tx[k].init(self._params[k]) for k in self.tx},
            rng=jax.random.PRNGKey(seed + 3),
        )
        self._jit_step = jax.jit(self._train_step_impl)
        self._jit_act = jax.jit(self._act_impl)

    def process_batch_for_training(self, batch):
        return process_rl_batch(batch, discount=self.discount)

    def _candidate_q(self, critic_params, perturb_params, sampler_params,
                     obs, key, n):
        """min-weighted ensemble Q over n sampled(+perturbed) actions,
        max over candidates -> [B]."""
        b = jax.tree.leaves(obs)[0].shape[0]
        cands = self.sampler.apply(
            {"params": sampler_params}, obs, key, n=n,
            method=_ActionVAE.sample,
        )  # [B*n, A]
        obs_rep = jax.tree.map(lambda a: jnp.repeat(a, n, axis=0), obs)
        if self.use_perturbation:
            cands = self.perturb.apply(
                {"params": perturb_params}, obs_rep, cands
            )
        q = self.critic.apply({"params": critic_params}, obs_rep, cands)
        w = self.ensemble_weight
        q_mix = w * jnp.min(q, axis=0) + (1 - w) * jnp.max(q, axis=0)
        q_mix = q_mix.reshape(b, n)
        best = jnp.argmax(q_mix, axis=1)
        cands = cands.reshape(b, n, self.ac_dim)
        best_a = jnp.take_along_axis(
            cands, best[:, None, None], axis=1
        )[:, 0]
        return jnp.max(q_mix, axis=1), best_a

    def _train_step_impl(self, state: RLState, batch):
        rng, k_vae, k_next, k_pert = jax.random.split(state.rng, 4)

        # --- action sampler (cVAE) ---
        def sampler_loss_fn(sampler_params):
            out = self.sampler.apply(
                {"params": sampler_params}, batch["obs"], batch["actions"],
                rngs={"sample": k_vae},
            )
            return out["reconstruction_loss"] + 0.5 * out["kl_loss"]

        s_loss, s_grads = jax.value_and_grad(sampler_loss_fn)(
            state.params["sampler"]
        )

        # --- critic ---
        q_next, _ = self._candidate_q(
            state.target_params["critic"], state.target_params["perturb"],
            state.params["sampler"], batch["next_obs"], k_next, self.n_samples,
        )
        target = td_target(
            batch["rewards"], batch["dones"], q_next, self.discount
        )

        def critic_loss_fn(critic_params):
            q = self.critic.apply(
                {"params": critic_params}, batch["obs"], batch["actions"]
            )
            return jnp.mean((q - jax.lax.stop_gradient(target)[None]) ** 2)

        c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
            state.params["critic"]
        )

        # --- perturbation actor: maximize Q of perturbed VAE actions ---
        def perturb_loss_fn(perturb_params):
            cands = self.sampler.apply(
                {"params": state.params["sampler"]}, batch["obs"], k_pert, n=1,
                method=_ActionVAE.sample,
            )
            a = self.perturb.apply(
                {"params": perturb_params}, batch["obs"], cands
            )
            q = self.critic.apply(
                {"params": state.params["critic"]}, batch["obs"], a
            )[0]
            return -jnp.mean(q)

        p_loss, p_grads = jax.value_and_grad(perturb_loss_fn)(
            state.params["perturb"]
        )

        new_params, new_opt = {}, {}
        grads = {"sampler": s_grads, "critic": c_grads, "perturb": p_grads}
        for name in self.tx:
            up, new_opt[name] = self.tx[name].update(
                grads[name], state.opt_state[name], state.params[name]
            )
            new_params[name] = optax.apply_updates(state.params[name], up)
        if not self.use_perturbation:
            new_params["perturb"] = state.params["perturb"]

        target_params = {
            "critic": polyak(
                state.target_params["critic"], new_params["critic"], self.tau
            ),
            "perturb": polyak(
                state.target_params["perturb"], new_params["perturb"], self.tau
            ),
        }
        new_state = RLState(
            step=state.step + 1, params=new_params,
            target_params=target_params, opt_state=new_opt, rng=rng,
        )
        return new_state, {
            "critic_loss": c_loss, "sampler_loss": s_loss,
            "perturb_loss": p_loss, "action_loss": c_loss,
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
            "Action_Sampler_Loss": float(info["losses"]["sampler_loss"]),
        }

    def _act_impl(self, params, target_params, obs, key):
        _, best_a = self._candidate_q(
            params["critic"], params["perturb"], params["sampler"], obs, key,
            self.n_samples,
        )
        return best_a

    def get_action(self, obs_dict, goal_dict=None):
        rng, key = jax.random.split(self.state.rng)
        self.state = self.state._replace(rng=rng)
        obs = jax.tree.map(jnp.asarray, obs_dict)
        obs = {
            k: v[:, -1] if v.ndim > 1 + len(self.obs_shapes[k]) else v
            for k, v in obs.items()
        }
        return np.asarray(
            self._jit_act(self.state.params, self.state.target_params, obs, key)
        )

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
