"""ACT — Action Chunking Transformer (CVAE).

Counterpart of reference algo/act.py:34-247 (a BC_VAE subclass wrapping
the ACT/DETR-style CVAE from Zhao et al. 2023):
- style encoder: transformer over [CLS, joint-obs token, action-chunk
  tokens] -> latent z (mu/logvar)
- decoder: transformer with learned chunk-position queries cross-attending
  to (obs features, z) memory -> action chunk
- loss: L1 reconstruction + kl_weight * KL (reference act config
  kl_weight=10 default in robomimic's act_config)
- rollout: executes the predicted chunk open-loop (action queue)
"""

from __future__ import annotations

import functools
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from lipvq_tpu.algo.base import (
    PolicyAlgo,
    TrainState,
    optimizer_from_optim_params,
    register_algo_factory_func,
)
from lipvq_tpu.models.base_nets import TorchLinear
from lipvq_tpu.models.obs_nets import ObservationGroupEncoder, obs_spec
from lipvq_tpu.models.vae_nets import kl_divergence, reparameterize


@register_algo_factory_func("act")
def algo_config_to_class(algo_config):
    return ACT, {}


class _ACTNet(nn.Module):
    group_specs: tuple
    ac_dim: int
    chunk_size: int
    hidden_dim: int = 512
    latent_dim: int = 32
    num_heads: int = 8
    enc_layers: int = 4
    dec_layers: int = 7
    ff_dim: int = 3200

    def _block(self, x, prefix, train, cross=None):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, name=f"{prefix}_attn"
        )
        y = attn(nn.LayerNorm(name=f"{prefix}_ln1")(x))
        x = x + y
        if cross is not None:
            ca = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"{prefix}_cross"
            )
            y = ca(nn.LayerNorm(name=f"{prefix}_ln_q")(x), cross)
            x = x + y
        h = nn.LayerNorm(name=f"{prefix}_ln2")(x)
        h = TorchLinear(self.ff_dim, name=f"{prefix}_ff1")(h)
        h = jax.nn.relu(h)
        h = TorchLinear(self.hidden_dim, name=f"{prefix}_ff2")(h)
        return x + h

    @nn.compact
    def __call__(self, obs, actions=None, train: bool = False, z=None,
                 rng=None):
        """obs leaves [B, ...] (single step); actions [B, chunk, ac_dim]
        for training (style encoding); z optional externally-supplied
        latent. Returns (a_hat, mu, logvar)."""
        enc = ObservationGroupEncoder(
            self.group_specs, feature_activation=None, name="obs_enc"
        )
        obs_feat = enc(train=train, obs=obs)  # [B, D]
        obs_tok = TorchLinear(self.hidden_dim, name="obs_proj")(obs_feat)
        b = obs_tok.shape[0]

        mu = jnp.zeros((b, self.latent_dim))
        logvar = jnp.zeros((b, self.latent_dim))
        if actions is not None:
            # style encoder over [CLS, obs, action tokens]
            a_tok = TorchLinear(self.hidden_dim, name="act_proj")(actions)
            cls = self.param(
                "cls_embed", jax.nn.initializers.normal(0.02),
                (1, 1, self.hidden_dim),
            )
            seq = jnp.concatenate(
                [jnp.tile(cls, (b, 1, 1)), obs_tok[:, None], a_tok], axis=1
            )
            pos = self.param(
                "enc_pos_embed", jax.nn.initializers.normal(0.02),
                (1, 2 + self.chunk_size, self.hidden_dim),
            )
            x = seq + pos
            for i in range(self.enc_layers):
                x = self._block(x, f"enc{i}", train)
            style = x[:, 0]
            mu = TorchLinear(self.latent_dim, name="latent_mu")(style)
            logvar = TorchLinear(self.latent_dim, name="latent_logvar")(style)
            if rng is None:
                rng = self.make_rng("sample")
            z = reparameterize(rng, mu, logvar)
        elif z is None:
            z = jnp.zeros((b, self.latent_dim))  # prior mean at test time

        # decoder: learned queries cross-attend to [obs token, z token]
        z_tok = TorchLinear(self.hidden_dim, name="z_proj")(z)
        memory = jnp.stack([obs_tok, z_tok], axis=1)  # [B, 2, H]
        queries = self.param(
            "query_embed", jax.nn.initializers.normal(0.02),
            (1, self.chunk_size, self.hidden_dim),
        )
        x = jnp.tile(queries, (b, 1, 1))
        for i in range(self.dec_layers):
            x = self._block(x, f"dec{i}", train, cross=memory)
        a_hat = TorchLinear(self.ac_dim, name="action_head")(x)
        return a_hat, mu, logvar


class ACT(PolicyAlgo):
    def _create_networks(self):
        ac = self.algo_config.act
        self.chunk_size = int(ac.get("chunk_size", 10))
        self.kl_weight = float(ac.get("kl_weight", 10.0))
        spec = obs_spec(self.obs_shapes)
        self.net = _ACTNet(
            group_specs=(("obs", spec),),
            ac_dim=self.ac_dim,
            chunk_size=self.chunk_size,
            hidden_dim=int(ac.get("hidden_dim", 512)),
            latent_dim=int(ac.get("latent_dim", 32)),
            num_heads=int(ac.get("num_heads", 8)),
            enc_layers=int(ac.get("enc_layers", 4)),
            dec_layers=int(ac.get("dec_layers", 7)),
            ff_dim=int(ac.get("ff_dim", 3200)),
        )
        seed = int(self.global_config.train.seed)
        dummy_obs = {
            k: jnp.zeros((2,) + tuple(s), jnp.float32)
            for k, s in self.obs_shapes.items()
        }
        dummy_act = jnp.zeros((2, self.chunk_size, self.ac_dim), jnp.float32)
        variables = self.net.init(
            {"params": jax.random.PRNGKey(seed),
             "sample": jax.random.PRNGKey(seed + 1)},
            dummy_obs, dummy_act, train=False,
        )
        self._params = variables["params"]
        self._extra_vars = {k: v for k, v in variables.items() if k != "params"}
        self._action_queue = deque()

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
            rng=jax.random.PRNGKey(seed + 2),
        )
        self._jit_train_step = jax.jit(
            functools.partial(self._train_step_impl, update=True)
        )
        self._jit_val_step = jax.jit(
            functools.partial(self._train_step_impl, update=False)
        )
        self._jit_infer = jax.jit(self._infer_impl)

    def process_batch_for_training(self, batch):
        return {
            "obs": {k: np.asarray(v)[:, 0] for k, v in batch["obs"].items()},
            "actions": np.asarray(batch["actions"])[:, : self.chunk_size],
            "goal_obs": batch.get("goal_obs", None),
        }

    def _train_step_impl(self, state: TrainState, batch, update: bool = True):
        rng, s_rng = jax.random.split(state.rng)

        def loss_fn(params):
            a_hat, mu, logvar = self.net.apply(
                {"params": params, **state.extra_vars}, batch["obs"],
                batch["actions"], train=update, rngs={"sample": s_rng},
            )
            l1 = jnp.mean(jnp.abs(a_hat - batch["actions"]))
            kl = kl_divergence(mu, logvar)
            loss = l1 + self.kl_weight * kl
            return loss, {"action_loss": loss, "l1_loss": l1, "kl_loss": kl}

        if update:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                step=state.step + 1, params=params, opt_state=opt_state,
                extra_vars=state.extra_vars, rng=rng,
            )
        else:
            _, metrics = loss_fn(state.params)
            new_state = state._replace(rng=rng)
        return new_state, metrics

    def train_on_batch(self, batch, epoch, validate: bool = False):
        batch = self._put_batch(batch)
        step = self._jit_val_step if validate else self._jit_train_step
        self.state, metrics = step(self.state, batch)
        return {"losses": metrics}

    def log_info(self, info):
        return {
            "Loss": float(info["losses"]["action_loss"]),
            "L1_Loss": float(info["losses"]["l1_loss"]),
            "KL_Loss": float(info["losses"]["kl_loss"]),
        }

    def _infer_impl(self, state, obs):
        a_hat, _, _ = self.net.apply(
            {"params": state.params, **state.extra_vars}, obs, None,
            train=False,
        )
        return a_hat

    def reset(self):
        self._action_queue.clear()

    def get_action(self, obs_dict, goal_dict=None):
        if not self._action_queue:
            obs = {
                k: jnp.asarray(v)[:, -1] if np.asarray(v).ndim > 2 else
                jnp.asarray(v)
                for k, v in obs_dict.items()
            }
            chunk = np.asarray(self._jit_infer(self.state, obs))
            for i in range(chunk.shape[1]):
                self._action_queue.append(chunk[:, i])
        return self._action_queue.popleft()
