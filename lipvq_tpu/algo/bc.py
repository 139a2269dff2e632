"""Behavior cloning family.

Counterpart of reference algo/bc.py:
- ``BC``                 — deterministic actor, L2+L1+cosine losses (:34)
- ``BC_GMM``             — GMM NLL (:315)
- ``BC_RNN_GMM``         — RNN GMM over sequences (:559)
- ``BC_Transformer_GMM`` — transformer GMM over sequences (:799;
  SURVEY.md Appendix B.1 — the non-ICL transformer baseline used by
  bc_xfmr_gen)

All share one jitted train step built over TrainState.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lipvq_tpu.algo.base import (
    PolicyAlgo,
    TrainState,
    optimizer_from_optim_params,
    register_algo_factory_func,
)
from lipvq_tpu.models.distributions import GMMParams, gmm_log_prob, gmm_sample
from lipvq_tpu.models.obs_nets import obs_spec
from lipvq_tpu.models.policy_nets import (
    ActorNetwork,
    GMMActorNetwork,
    RNNGMMActorNetwork,
    TransformerGMMActorNetwork,
)


@register_algo_factory_func("bc")
def algo_config_to_class(algo_config):
    """Dispatch on enabled sub-configs (reference bc.py:30-60)."""
    gaussian = algo_config.gaussian.enabled
    gmm = algo_config.gmm.enabled
    vae = algo_config.vae.enabled
    rnn = algo_config.rnn.enabled
    transformer = algo_config.transformer.enabled
    if transformer and gmm:
        return BCTransformerGMM, {}
    if rnn and gmm:
        return BCRNNGMM, {}
    if vae:
        return BCVAE, {}
    if gmm:
        return BCGMM, {}
    if gaussian:
        return BCGaussian, {}
    return BC, {}


class BC(PolicyAlgo):
    """Vanilla BC: deterministic actor + L2/L1/cosine loss."""

    sequence = False  # obs are [B, ...] (single step)

    def _create_networks(self):
        spec = obs_spec(self.obs_shapes)
        group_specs = [("obs", spec)]
        if self.goal_shapes:
            group_specs.append(("goal", obs_spec(self.goal_shapes)))
        self.group_specs = tuple(group_specs)
        from lipvq_tpu.utils.obs_utils import encoder_cores_from_config

        self.encoder_cores = encoder_cores_from_config(
            self.obs_config, self.obs_shapes
        )
        self.net = self._build_net()
        dummy = self._dummy_inputs()
        seed = int(self.global_config.train.seed)
        variables = self._init_variables(dummy, seed)
        self._params = variables["params"]
        self._extra_vars = {k: v for k, v in variables.items() if k != "params"}

    def _build_net(self):
        return ActorNetwork(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            layer_dims=tuple(self.algo_config.actor_layer_dims),
            encoder_cores=self.encoder_cores,
        )

    def _dummy_inputs(self):
        if self.sequence:
            t = self._seq_len()
            return {
                k: jnp.zeros((2, t) + tuple(s), jnp.float32)
                for k, s in self.obs_shapes.items()
            }
        return {
            k: jnp.zeros((2,) + tuple(s), jnp.float32)
            for k, s in self.obs_shapes.items()
        }

    def _seq_len(self):
        if self.algo_config.transformer.enabled:
            return int(self.algo_config.transformer.context_length)
        if self.algo_config.rnn.enabled:
            return int(self.algo_config.rnn.horizon)
        return 1

    def _init_variables(self, dummy_obs, seed):
        return self.net.init(
            {"params": jax.random.PRNGKey(seed),
             "dropout": jax.random.PRNGKey(seed + 1),
             "sample": jax.random.PRNGKey(seed + 2)},
            dummy_obs, train=False,
        )

    def _create_optimizers(self):
        self.tx = optimizer_from_optim_params(
            self.algo_config.optim_params.policy,
            max_grad_norm=self.global_config.train.max_grad_norm,
        )
        seed = int(self.global_config.train.seed)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self._params,
            opt_state=self.tx.init(self._params),
            extra_vars=self._extra_vars,
            rng=jax.random.PRNGKey(seed + 3),
        )
        self._jit_train_step = jax.jit(
            functools.partial(self._train_step_impl, update=True)
        )
        self._jit_val_step = jax.jit(
            functools.partial(self._train_step_impl, update=False)
        )
        self._jit_get_action = jax.jit(self._get_action_impl)

    # -- batch prep --------------------------------------------------------
    def process_batch_for_training(self, batch):
        from lipvq_tpu.utils.obs_utils import process_obs

        out = {"goal_obs": batch.get("goal_obs", None)}
        if self.sequence:
            t = self._seq_len()
            out["obs"] = {
                k: process_obs(np.asarray(v)[:, :t], obs_key=k)
                for k, v in batch["obs"].items()
            }
            out["actions"] = np.asarray(batch["actions"])[:, :t]
        else:
            out["obs"] = {
                k: process_obs(np.asarray(v)[:, 0], obs_key=k)
                for k, v in batch["obs"].items()
            }
            out["actions"] = np.asarray(batch["actions"])[:, 0]
        return out

    # -- losses ------------------------------------------------------------
    def _loss(self, params, extra_vars, batch, rng, train):
        actions = batch["actions"]
        pred = self.net.apply(
            {"params": params, **extra_vars}, batch["obs"],
            goal=batch["goal_obs"], train=train,
            rngs={"dropout": rng, "sample": rng},
        )
        l2 = jnp.mean((pred - actions) ** 2)
        l1 = jnp.mean(jnp.abs(pred - actions))
        cos = 1.0 - jnp.mean(
            jnp.sum(pred * actions, -1)
            / (jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(actions, axis=-1)
               + 1e-8)
        )
        lw = self.algo_config.loss
        loss = (
            float(lw.l2_weight) * l2
            + float(lw.l1_weight) * l1
            + float(lw.cos_weight) * cos
        )
        return loss, {"action_loss": loss, "l2_loss": l2, "l1_loss": l1,
                      "cos_loss": cos}

    def _train_step_impl(self, state: TrainState, batch, update: bool = True):
        rng, step_rng = jax.random.split(state.rng)
        if update:
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: self._loss(p, state.extra_vars, batch, step_rng, True),
                has_aux=True,
            )(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            metrics["policy_grad_norms"] = optax.global_norm(grads)
            new_state = TrainState(
                step=state.step + 1, params=params, opt_state=opt_state,
                extra_vars=state.extra_vars, rng=rng,
            )
        else:
            _, metrics = self._loss(
                state.params, state.extra_vars, batch, step_rng, False
            )
            new_state = state._replace(rng=rng)
        return new_state, metrics

    def train_on_batch(self, batch, epoch, validate: bool = False):
        batch = self._put_batch(batch)
        step = self._jit_val_step if validate else self._jit_train_step
        self.state, metrics = step(self.state, batch)
        return {"losses": metrics}

    def log_info(self, info):
        log = {"Loss": float(info["losses"]["action_loss"])}
        for k in ("l2_loss", "l1_loss", "cos_loss", "log_probs"):
            if k in info["losses"]:
                log[k.title()] = float(info["losses"][k])
        return log

    # -- inference ---------------------------------------------------------
    def _get_action_impl(self, state, obs, goal, key):
        return self.net.apply(
            {"params": state.params, **state.extra_vars}, obs, goal=goal,
            train=False, rngs={"sample": key, "dropout": key},
        )

    def get_action(self, obs_dict, goal_dict=None):
        rng, key = jax.random.split(self.state.rng)
        self.state = self.state._replace(rng=rng)
        act = self._jit_get_action(
            self.state, jax.tree.map(jnp.asarray, obs_dict),
            jax.tree.map(jnp.asarray, goal_dict) if goal_dict else None, key,
        )
        act = np.asarray(act)
        if self.sequence and act.ndim == 3:
            act = act[:, -1]
        return act


class BCVAE(BC):
    """cVAE BC (reference bc.py BC_VAE:180): decoder reconstructs actions
    conditioned on obs features; ELBO = recon + kl_weight * KL."""

    def _build_net(self):
        from flax import linen as nn

        from lipvq_tpu.models.obs_nets import (
            ObservationGroupEncoder,
            spec_flat_dim,
        )
        from lipvq_tpu.models.vae_nets import VAE

        group_specs = self.group_specs
        ac_dim = self.ac_dim
        vc = self.algo_config.vae
        cond_dim = sum(spec_flat_dim(s) for _, s in group_specs)

        class _Net(nn.Module):
            @nn.compact
            def __call__(self, obs, actions=None, goal=None,
                         train: bool = False):
                enc = ObservationGroupEncoder(
                    group_specs, feature_activation=None, name="obs_enc"
                )
                groups = {"obs": obs}
                if goal is not None:
                    groups["goal"] = goal
                cond = enc(train=train, **groups)
                vae = VAE(
                    input_dim=ac_dim,
                    latent_dim=int(vc.latent_dim),
                    cond_dim=cond.shape[-1],
                    encoder_layer_dims=tuple(vc.encoder_layer_dims),
                    decoder_layer_dims=tuple(vc.decoder_layer_dims),
                    decoder_is_conditioned=bool(vc.decoder.is_conditioned),
                    prior_learn=bool(vc.prior.learn),
                    prior_is_conditioned=bool(vc.prior.is_conditioned),
                    prior_use_gmm=bool(vc.prior.use_gmm),
                    prior_gmm_num_modes=int(vc.prior.gmm_num_modes),
                    prior_gmm_learn_weights=bool(vc.prior.gmm_learn_weights),
                    prior_use_categorical=bool(vc.prior.use_categorical),
                    prior_categorical_dim=int(vc.prior.categorical_dim),
                    prior_categorical_gumbel_temp=float(
                        vc.prior.categorical_init_temp
                    ),
                    prior_layer_dims=tuple(vc.prior_layer_dims),
                    name="vae",
                )
                if actions is not None:
                    return vae(actions, cond=cond)
                key = self.make_rng("sample")
                return vae.sample_prior(key, cond.shape[0], cond=cond)

        return _Net()

    def _init_variables(self, dummy_obs, seed):
        dummy_act = jnp.zeros((2, self.ac_dim), jnp.float32)
        return self.net.init(
            {"params": jax.random.PRNGKey(seed),
             "sample": jax.random.PRNGKey(seed + 1)},
            dummy_obs, dummy_act, train=False,
        )

    def _loss(self, params, extra_vars, batch, rng, train):
        out = self.net.apply(
            {"params": params, **extra_vars}, batch["obs"], batch["actions"],
            goal=batch["goal_obs"], train=train,
            rngs={"sample": rng, "dropout": rng},
        )
        kl_weight = float(self.algo_config.vae.kl_weight)
        loss = out["reconstruction_loss"] + kl_weight * out["kl_loss"]
        return loss, {
            "action_loss": loss,
            "recons_loss": out["reconstruction_loss"],
            "kl_loss": out["kl_loss"],
        }

    def _get_action_impl(self, state, obs, goal, key):
        return self.net.apply(
            {"params": state.params, **state.extra_vars}, obs, None,
            goal=goal, train=False, rngs={"sample": key, "dropout": key},
        )


class BCGMM(BC):
    """GMM BC: NLL loss (reference bc.py BC_GMM:315)."""

    def _build_net(self):
        return GMMActorNetwork(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            encoder_cores=self.encoder_cores,
            layer_dims=tuple(self.algo_config.actor_layer_dims),
            num_modes=int(self.algo_config.gmm.num_modes),
            min_std=float(self.algo_config.gmm.min_std),
            std_activation=str(self.algo_config.gmm.std_activation),
            low_noise_eval=bool(self.algo_config.gmm.low_noise_eval),
        )

    def _init_variables(self, dummy_obs, seed):
        return self.net.init(
            {"params": jax.random.PRNGKey(seed),
             "dropout": jax.random.PRNGKey(seed + 1)},
            dummy_obs, train=False, method=type(self.net).forward_train,
        )

    def _loss(self, params, extra_vars, batch, rng, train):
        dists = self.net.apply(
            {"params": params, **extra_vars}, batch["obs"],
            goal=batch["goal_obs"], train=train,
            rngs={"dropout": rng},
            method=type(self.net).forward_train,
        )
        lp = gmm_log_prob(dists, batch["actions"])
        loss = -jnp.mean(lp)
        return loss, {"action_loss": loss, "log_probs": -loss}

    def _get_action_impl(self, state, obs, goal, key):
        dists = self.net.apply(
            {"params": state.params, **state.extra_vars}, obs, goal=goal,
            train=False, rngs={"dropout": key},
            method=type(self.net).forward_train,
        )
        return gmm_sample(dists, key)


class BCGaussian(BCGMM):
    """Gaussian BC (reference bc.py BC_Gaussian:233): a unimodal policy —
    realized as a 1-mode GMM whose std settings come from the gaussian
    config section (init_std folded into min_std when fixed_std)."""

    def _build_net(self):
        g = self.algo_config.gaussian
        min_std = float(g.min_std)
        if bool(g.fixed_std):
            min_std = float(g.init_std)
        return GMMActorNetwork(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            encoder_cores=self.encoder_cores,
            layer_dims=tuple(self.algo_config.actor_layer_dims),
            num_modes=1,
            min_std=min_std,
            std_activation=str(g.std_activation),
            low_noise_eval=bool(g.low_noise_eval),
        )


class BCRNNGMM(BCGMM):
    """RNN GMM BC over sequences (reference bc.py BC_RNN_GMM:559)."""

    sequence = True

    def _build_net(self):
        return RNNGMMActorNetwork(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            encoder_cores=self.encoder_cores,
            hidden_dim=int(self.algo_config.rnn.hidden_dim),
            num_layers=int(self.algo_config.rnn.num_layers),
            num_modes=int(self.algo_config.gmm.num_modes),
            min_std=float(self.algo_config.gmm.min_std),
            std_activation=str(self.algo_config.gmm.std_activation),
            low_noise_eval=bool(self.algo_config.gmm.low_noise_eval),
        )


class BCTransformerGMM(BCGMM):
    """Transformer GMM BC (reference bc.py BC_Transformer_GMM:799)."""

    sequence = True

    def _build_net(self):
        tc = self.algo_config.transformer
        return TransformerGMMActorNetwork(
            group_specs=self.group_specs, ac_dim=self.ac_dim,
            encoder_cores=self.encoder_cores,
            embed_dim=int(tc.embed_dim),
            num_layers=int(tc.num_layers),
            num_heads=int(tc.num_heads),
            context_length=int(tc.context_length),
            causal=bool(tc.causal),
            emb_dropout=float(tc.emb_dropout),
            attn_dropout=float(tc.attn_dropout),
            block_output_dropout=float(tc.block_output_dropout),
            sinusoidal_embedding=bool(tc.sinusoidal_embedding),
            nn_parameter_for_timesteps=bool(tc.nn_parameter_for_timesteps),
            activation=str(tc.activation),
            num_modes=int(self.algo_config.gmm.num_modes),
            min_std=float(self.algo_config.gmm.min_std),
            std_activation=str(self.algo_config.gmm.std_activation),
            low_noise_eval=bool(self.algo_config.gmm.low_noise_eval),
        )

    def _loss(self, params, extra_vars, batch, rng, train):
        dists = self.net.apply(
            {"params": params, **extra_vars}, batch["obs"],
            goal=batch["goal_obs"], train=train,
            rngs={"dropout": rng},
            method=type(self.net).forward_train,
        )
        if not bool(self.algo_config.transformer.supervise_all_steps):
            dists = GMMParams(
                means=dists.means[:, -1], scales=dists.scales[:, -1],
                logits=dists.logits[:, -1],
            )
            actions = batch["actions"][:, -1]
        else:
            actions = batch["actions"]
        lp = gmm_log_prob(dists, actions)
        loss = -jnp.mean(lp)
        return loss, {"action_loss": loss, "log_probs": -loss}
