"""Goal learning (subgoal prediction) algorithms.

Counterpart of reference algo/gl.py (775 LoC):
- ``GL``     — deterministic subgoal predictor: MLP from obs(+goal)
  features to the observation at ``subgoal_horizon`` steps ahead
  (reference gl.py:37-216; target extraction :115-117)
- ``GLVAE``  — cVAE over subgoals conditioned on obs features
  (reference GL_VAE), supporting ``sample_subgoals``
- ``ValuePlanner`` — samples N subgoals from a GLVAE and picks the best
  under a state-value estimate (reference ValuePlanner; the reference
  scores with a full value algo — here a TD(0)-trained V net, a
  documented round-1 simplification)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from lipvq_tpu.algo.base import (
    Algo,
    TrainState,
    optimizer_from_optim_params,
    register_algo_factory_func,
)
from lipvq_tpu.models.base_nets import MLP
from lipvq_tpu.models.obs_nets import (
    ObservationDecoder,
    ObservationGroupEncoder,
    obs_spec,
    spec_flat_dim,
)
from lipvq_tpu.models.vae_nets import VAE


@register_algo_factory_func("gl")
def algo_config_to_class(algo_config):
    if algo_config.vae.enabled:
        return GLVAE, {}
    return GL, {}


class _GoalNet(nn.Module):
    group_specs: tuple
    subgoal_spec: tuple
    layer_dims: tuple = (300, 400)

    @nn.compact
    def __call__(self, obs, goal=None, train: bool = False):
        enc = ObservationGroupEncoder(self.group_specs, name="enc")
        groups = {"obs": obs}
        if goal is not None:
            groups["goal"] = goal
        h = enc(train=train, **groups)
        h = MLP(self.layer_dims, self.layer_dims[-1], activation="relu",
                name="mlp")(h)
        return ObservationDecoder(self.subgoal_spec, name="decoder")(h)


class GL(Algo):
    """Deterministic subgoal prediction."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)

    def _create_networks(self):
        self.subgoal_horizon = int(self.algo_config.subgoal_horizon)
        self.subgoal_shapes = dict(self.obs_shapes)
        spec = obs_spec(self.obs_shapes)
        group_specs = [("obs", spec)]
        if self.goal_shapes:
            group_specs.append(("goal", obs_spec(self.goal_shapes)))
        self.group_specs = tuple(group_specs)
        self.net = self._build_net()
        seed = int(self.global_config.train.seed)
        dummy_obs = {
            k: jnp.zeros((2,) + tuple(s), jnp.float32)
            for k, s in self.obs_shapes.items()
        }
        variables = self._init_variables(dummy_obs, seed)
        self._params = variables["params"]
        self._extra_vars = {k: v for k, v in variables.items() if k != "params"}

    def _build_net(self):
        return _GoalNet(
            group_specs=self.group_specs,
            subgoal_spec=obs_spec(self.subgoal_shapes),
            layer_dims=tuple(self.algo_config.get("ae", {}).get(
                "planner_layer_dims", (300, 400))),
        )

    def _init_variables(self, dummy_obs, seed):
        return self.net.init({"params": jax.random.PRNGKey(seed)}, dummy_obs)

    def _create_optimizers(self):
        self.tx = optimizer_from_optim_params(
            self.algo_config.optim_params.goal_network
        )
        seed = int(self.global_config.train.seed)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self._params,
            opt_state=self.tx.init(self._params),
            extra_vars=self._extra_vars,
            rng=jax.random.PRNGKey(seed + 1),
        )
        self._jit_train = jax.jit(
            functools.partial(self._train_step_impl, update=True)
        )
        self._jit_val = jax.jit(
            functools.partial(self._train_step_impl, update=False)
        )
        self._jit_predict = jax.jit(self._predict_impl)

    def process_batch_for_training(self, batch):
        """Subgoal = next_obs at subgoal_horizon - 1 (reference :115-117)."""
        h = self.subgoal_horizon
        assert "next_obs" in batch, "GL needs next_obs (hdf5_load_next_obs)"
        out = {
            "obs": {k: np.asarray(v)[:, 0] for k, v in batch["obs"].items()},
            "subgoals": {
                k: np.asarray(v)[:, h - 1]
                for k, v in batch["next_obs"].items()
            },
            "goal_obs": batch.get("goal_obs", None),
        }
        out["target_subgoals"] = out["subgoals"]
        return out

    def _loss(self, params, batch):
        pred = self.net.apply(
            {"params": params, **self.state.extra_vars}, batch["obs"],
            goal=batch["goal_obs"],
        )
        losses = {
            k: jnp.mean((pred[k] - batch["target_subgoals"][k]) ** 2)
            for k in pred
        }
        total = sum(losses.values())
        return total, losses

    def _train_step_impl(self, state: TrainState, batch, update: bool = True):
        if update:
            (loss, losses), grads = jax.value_and_grad(
                lambda p: self._loss(p, batch), has_aux=True
            )(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            state = TrainState(
                step=state.step + 1, params=params, opt_state=opt_state,
                extra_vars=state.extra_vars, rng=state.rng,
            )
        else:
            loss, losses = self._loss(state.params, batch)
        return state, {"action_loss": loss, "goal_loss": loss}

    def train_on_batch(self, batch, epoch, validate: bool = False):
        batch = self._put_batch(batch)
        step = self._jit_val if validate else self._jit_train
        self.state, metrics = step(self.state, batch)
        return {"losses": metrics}

    def log_info(self, info):
        return {"Loss": float(info["losses"]["goal_loss"])}

    def _predict_impl(self, state, obs, goal):
        return self.net.apply(
            {"params": state.params, **state.extra_vars}, obs, goal=goal
        )

    def get_subgoal_predictions(self, obs_dict, goal_dict=None):
        out = self._jit_predict(
            self.state, jax.tree.map(jnp.asarray, obs_dict),
            jax.tree.map(jnp.asarray, goal_dict) if goal_dict else None,
        )
        return jax.tree.map(np.asarray, out)

    def get_action(self, obs_dict, goal_dict=None):
        raise NotImplementedError("GL is a planner, not a policy")


class _GoalVAENet(nn.Module):
    group_specs: tuple
    subgoal_spec: tuple
    latent_dim: int
    encoder_layer_dims: tuple = (300, 400)
    decoder_layer_dims: tuple = (300, 400)

    prior_learn: bool = False
    prior_is_conditioned: bool = False
    prior_use_gmm: bool = False
    prior_gmm_num_modes: int = 10
    prior_gmm_learn_weights: bool = False

    def setup(self):
        self.enc = ObservationGroupEncoder(self.group_specs)
        self.flat_dim = spec_flat_dim(self.subgoal_spec)
        self.vae = VAE(
            input_dim=self.flat_dim, latent_dim=self.latent_dim,
            encoder_layer_dims=self.encoder_layer_dims,
            decoder_layer_dims=self.decoder_layer_dims,
            prior_learn=self.prior_learn,
            prior_is_conditioned=self.prior_is_conditioned,
            prior_use_gmm=self.prior_use_gmm,
            prior_gmm_num_modes=self.prior_gmm_num_modes,
            prior_gmm_learn_weights=self.prior_gmm_learn_weights,
        )

    def _flatten_subgoals(self, subgoals):
        return jnp.concatenate(
            [subgoals[k].reshape(subgoals[k].shape[0], -1)
             for k, _ in self.subgoal_spec],
            axis=-1,
        )

    def _unflatten(self, flat):
        out = {}
        i = 0
        for k, shape in self.subgoal_spec:
            n = int(np.prod(shape))
            out[k] = flat[:, i : i + n].reshape((-1,) + tuple(shape))
            i += n
        return out

    def __call__(self, obs, subgoals, goal=None, train: bool = False):
        groups = {"obs": obs}
        if goal is not None:
            groups["goal"] = goal
        cond = self.enc(train=train, **groups)
        return self.vae(self._flatten_subgoals(subgoals), cond=cond)

    def sample(self, obs, key, n: int = 1, goal=None, train: bool = False):
        groups = {"obs": obs}
        if goal is not None:
            groups["goal"] = goal
        cond = self.enc(train=train, **groups)
        cond_rep = jnp.repeat(cond, n, axis=0)
        z = jax.random.normal(key, (cond_rep.shape[0], self.vae.latent_dim))
        flat = self.vae.decode(z, cond_rep)
        return self._unflatten(flat)


class GLVAE(GL):
    """cVAE subgoal prediction (reference GL_VAE)."""

    def _build_net(self):
        vc = self.algo_config.vae
        return _GoalVAENet(
            group_specs=self.group_specs,
            subgoal_spec=obs_spec(self.subgoal_shapes),
            latent_dim=int(vc.latent_dim),
            encoder_layer_dims=tuple(vc.encoder_layer_dims),
            decoder_layer_dims=tuple(vc.decoder_layer_dims),
            prior_learn=bool(vc.prior.learn),
            prior_is_conditioned=False,  # subgoal prior is unconditioned here
            prior_use_gmm=bool(vc.prior.use_gmm),
            prior_gmm_num_modes=int(vc.prior.gmm_num_modes),
            prior_gmm_learn_weights=bool(vc.prior.gmm_learn_weights),
        )

    def _init_variables(self, dummy_obs, seed):
        dummy_sub = {
            k: jnp.zeros((2,) + tuple(s), jnp.float32)
            for k, s in self.subgoal_shapes.items()
        }
        return self.net.init(
            {"params": jax.random.PRNGKey(seed),
             "sample": jax.random.PRNGKey(seed + 1)},
            dummy_obs, dummy_sub,
        )

    def _loss(self, params, batch):
        out = self.net.apply(
            {"params": params, **self.state.extra_vars}, batch["obs"],
            batch["target_subgoals"], goal=batch["goal_obs"],
            rngs={"sample": jax.random.fold_in(self.state.rng, 7)},
        )
        kl_weight = float(self.algo_config.vae.kl_weight)
        total = out["reconstruction_loss"] + kl_weight * out["kl_loss"]
        return total, {"recons": out["reconstruction_loss"],
                       "kl": out["kl_loss"]}

    def sample_subgoals(self, obs_dict, goal_dict=None, num_samples: int = 1):
        rng, key = jax.random.split(self.state.rng)
        self.state = self.state._replace(rng=rng)
        out = self.net.apply(
            {"params": self.state.params, **self.state.extra_vars},
            jax.tree.map(jnp.asarray, obs_dict), key, n=num_samples,
            goal=jax.tree.map(jnp.asarray, goal_dict) if goal_dict else None,
            method=_GoalVAENet.sample,
        )
        return jax.tree.map(np.asarray, out)

    @property
    def latent_dim(self) -> int:
        return int(self.algo_config.vae.latent_dim)

    def encode_latent_subgoals(self, obs_dict, subgoals) -> np.ndarray:
        """Posterior means q(z | subgoal, obs-features) — the latent
        targets the HBC actor conditions on in latent-subgoal mode
        (reference hbc.py:101-102)."""
        out = self.net.apply(
            {"params": self.state.params, **self.state.extra_vars},
            jax.tree.map(jnp.asarray, obs_dict),
            jax.tree.map(jnp.asarray, subgoals),
            rngs={"sample": jax.random.fold_in(self.state.rng, 3)},
        )
        return np.asarray(out["mu"])

    def sample_latent_subgoals(self, obs_dict, num_samples: int = 1):
        """Prior latents z ~ N(0, I) (or the learned prior) as subgoals."""
        rng, key = jax.random.split(self.state.rng)
        self.state = self.state._replace(rng=rng)
        b = jax.tree.leaves(obs_dict)[0].shape[0] * num_samples
        z = jax.random.normal(key, (b, self.latent_dim))
        return np.asarray(z)

    def get_subgoal_predictions(self, obs_dict, goal_dict=None):
        s = self.sample_subgoals(obs_dict, goal_dict, num_samples=1)
        return s


class ValuePlanner:
    """Sample N subgoals from a GLVAE; pick the argmax under a value fn
    (reference gl.py ValuePlanner)."""

    def __init__(self, planner: GLVAE, value_fn, num_samples: int = 10):
        self.planner = planner
        self.value_fn = value_fn  # dict obs -> [B] values
        self.num_samples = num_samples

    def get_subgoal_predictions(self, obs_dict, goal_dict=None):
        n = self.num_samples
        samples = self.planner.sample_subgoals(
            obs_dict, goal_dict, num_samples=n
        )  # leaves [B*n, ...]
        values = np.asarray(self.value_fn(samples))  # [B*n]
        b = values.shape[0] // n
        best = values.reshape(b, n).argmax(axis=1)
        out = {}
        for k, v in samples.items():
            v = v.reshape((b, n) + v.shape[1:])
            out[k] = v[np.arange(b), best]
        return out
