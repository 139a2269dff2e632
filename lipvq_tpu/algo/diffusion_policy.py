"""Diffusion Policy (UNet-1D DDPM/DDIM) with EMA.

Counterpart of reference algo/diffusion_policy.py:48-400:
- obs window To encoded per step -> flattened global conditioning
  (reference :74, :352)
- train: sample x_t = add_noise(actions, eps, t), predict eps, MSE
  (reference :163-247)
- EMA of network params with diffusers' power-decay schedule
  (decay = 1 - (1 + step)^-power, clipped; reference :86-89, ema.power
  0.75)
- inference: DDPM or DDIM reverse process over prediction horizon Tp,
  action queue replays Ta actions per trajectory (reference :266-378)
"""

from __future__ import annotations

import functools
from collections import deque

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
from lipvq_tpu.models.diffusion_nets import ConditionalUnet1D
from lipvq_tpu.models.obs_nets import ObservationGroupEncoder, obs_spec, spec_flat_dim
from lipvq_tpu.ops.diffusion_schedulers import (
    add_noise,
    ddim_sample,
    ddpm_sample,
    make_scheduler,
)


@register_algo_factory_func("diffusion_policy")
def algo_config_to_class(algo_config):
    assert algo_config.unet.enabled
    return DiffusionPolicyUNet, {}


class DiffusionPolicyUNet(PolicyAlgo):
    def _create_networks(self):
        hc = self.algo_config.horizon
        self.To = int(hc.observation_horizon)
        self.Ta = int(hc.action_horizon)
        self.Tp = int(hc.prediction_horizon)
        self.use_ddim = bool(self.algo_config.ddim.enabled)
        sc = self.algo_config.ddim if self.use_ddim else self.algo_config.ddpm
        self.scheduler = make_scheduler(
            num_train_timesteps=int(sc.num_train_timesteps),
            beta_schedule=str(sc.beta_schedule),
            clip_sample=bool(sc.clip_sample),
            prediction_type=str(sc.prediction_type),
        )
        self.num_inference_timesteps = int(sc.num_inference_timesteps)

        spec = obs_spec(self.obs_shapes)
        self.group_specs = (("obs", spec),)
        obs_dim = spec_flat_dim(spec)

        self.net = type(self).NetModule(
            group_specs=self.group_specs,
            ac_dim=self.ac_dim,
            To=self.To,
            obs_dim=obs_dim,
            down_dims=tuple(self.algo_config.unet.down_dims)
            if "down_dims" in self.algo_config.unet else (256, 512, 1024),
            kernel_size=int(self.algo_config.unet.get("kernel_size", 5)),
        )
        seed = int(self.global_config.train.seed)
        dummy_obs = {
            k: jnp.zeros((2, self.To) + tuple(s), jnp.float32)
            for k, s in self.obs_shapes.items()
        }
        variables = self.net.init(
            {"params": jax.random.PRNGKey(seed)},
            dummy_obs,
            jnp.zeros((2, self.Tp, self.ac_dim), jnp.float32),
            jnp.zeros((2,), jnp.int32),
        )
        self._params = variables["params"]
        self._extra_vars = {k: v for k, v in variables.items() if k != "params"}
        self._ema_params = jax.tree.map(jnp.copy, self._params)
        self.ema_enabled = bool(self.algo_config.ema.enabled)
        self.ema_power = float(self.algo_config.ema.power)
        self._action_queue = deque()

    from flax import linen as _nn

    class NetModule(_nn.Module):
        """Obs encoder + ConditionalUnet1D bundled for one param tree."""

        group_specs: tuple
        ac_dim: int
        To: int
        obs_dim: int
        down_dims: tuple = (256, 512, 1024)
        kernel_size: int = 5

        def setup(self):
            self.encoder = ObservationGroupEncoder(
                self.group_specs, feature_activation=None
            )
            self.unet = ConditionalUnet1D(
                input_dim=self.ac_dim,
                global_cond_dim=self.obs_dim * self.To,
                down_dims=self.down_dims,
                kernel_size=self.kernel_size,
            )

        def encode_obs(self, obs, train: bool = False):
            some = jax.tree.leaves(obs)[0]
            b, t = some.shape[:2]
            flat = jax.tree.map(
                lambda a: a.reshape((b * t,) + a.shape[2:]), obs
            )
            feats = self.encoder(train=train, obs=flat)
            return feats.reshape(b, t * feats.shape[-1])

        def __call__(self, obs, noisy_actions, timesteps, train: bool = False):
            cond = self.encode_obs(obs, train=train)
            return self.unet(noisy_actions, timesteps, cond)

    def _create_optimizers(self):
        num_training_steps = int(self.global_config.train.num_epochs) * int(
            self.global_config.experiment.epoch_every_n_steps or 100
        )
        self.tx = optimizer_from_optim_params(
            self.algo_config.optim_params.policy,
            max_grad_norm=self.global_config.train.max_grad_norm,
            num_training_steps=max(num_training_steps, 1000),
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
        self._jit_sample = jax.jit(self._sample_impl)

    def process_batch_for_training(self, batch):
        """obs first To steps; actions full Tp window (reference :126-160)."""
        out = {
            "obs": {
                k: np.asarray(v)[:, : self.To]
                for k, v in batch["obs"].items()
            },
            "actions": np.asarray(batch["actions"])[:, : self.Tp],
            "goal_obs": batch.get("goal_obs", None),
        }
        assert out["actions"].shape[1] == self.Tp, (
            f"need seq_length >= prediction_horizon {self.Tp}"
        )
        return out

    def _train_step_impl(self, state: TrainState, ema_params, batch,
                         update: bool = True):
        rng, noise_key, t_key = jax.random.split(state.rng, 3)
        actions = batch["actions"]
        b = actions.shape[0]

        def loss_fn(params):
            noise = jax.random.normal(noise_key, actions.shape)
            timesteps = jax.random.randint(
                t_key, (b,), 0, self.scheduler.num_train_timesteps
            )
            noisy = add_noise(self.scheduler, actions, noise, timesteps)
            pred = self.net.apply(
                {"params": params, **state.extra_vars}, batch["obs"], noisy,
                timesteps, train=update,
            )
            return jnp.mean((pred - noise) ** 2)

        if update:
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            # diffusers EMAModel decay schedule
            step = state.step + 1
            decay = 1.0 - (1.0 + step.astype(jnp.float32)) ** (-self.ema_power)
            decay = jnp.clip(decay, 0.0, 0.9999)
            ema_params = jax.tree.map(
                lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
            )
            new_state = TrainState(
                step=step, params=params, opt_state=opt_state,
                extra_vars=state.extra_vars, rng=rng,
            )
        else:
            loss = loss_fn(state.params)
            new_state = state._replace(rng=rng)
        return new_state, ema_params, {"action_loss": loss}

    def train_on_batch(self, batch, epoch, validate: bool = False):
        batch = self._put_batch(batch)
        step = self._jit_val_step if validate else self._jit_train_step
        self.state, self._ema_params, metrics = step(
            self.state, self._ema_params, batch
        )
        return {"losses": metrics}

    def log_info(self, info):
        return {"Loss": float(info["losses"]["action_loss"])}

    # -- inference ---------------------------------------------------------
    def _sample_impl(self, params, extra_vars, obs, key):
        cond_model = lambda x, t: self.net.apply(
            {"params": params, **extra_vars}, obs, x, t, train=False
        )
        b = jax.tree.leaves(obs)[0].shape[0]
        shape = (b, self.Tp, self.ac_dim)
        if self.use_ddim:
            return ddim_sample(
                self.scheduler, cond_model, shape, key,
                num_inference_timesteps=self.num_inference_timesteps,
            )
        return ddpm_sample(
            self.scheduler, cond_model, shape, key,
            num_inference_timesteps=self.num_inference_timesteps,
        )

    def reset(self):
        self._action_queue.clear()

    def get_action(self, obs_dict, goal_dict=None):
        """Queue-based action chunking (reference :278-320): sample a Tp
        trajectory, execute Ta actions starting at To-1."""
        if not self._action_queue:
            rng, key = jax.random.split(self.state.rng)
            self.state = self.state._replace(rng=rng)
            params = self._ema_params if self.ema_enabled else self.state.params
            obs = {
                k: jnp.asarray(v)[:, -self.To:]
                for k, v in obs_dict.items()
            }
            traj = np.asarray(
                self._jit_sample(params, self.state.extra_vars, obs, key)
            )
            start = self.To - 1
            for i in range(start, start + self.Ta):
                self._action_queue.append(traj[:, i])
        return self._action_queue.popleft()

    def serialize(self):
        from flax import serialization

        return serialization.to_bytes(
            {"params": self.state.params, "ema_params": self._ema_params,
             "extra_vars": self.state.extra_vars}
        )

    def deserialize(self, payload):
        from flax import serialization

        template = {"params": self.state.params,
                    "ema_params": self._ema_params,
                    "extra_vars": self.state.extra_vars}
        restored = serialization.from_bytes(template, payload)
        self.state = self.state._replace(
            params=restored["params"], extra_vars=restored["extra_vars"]
        )
        self._ema_params = restored["ema_params"]

    def serialize_full(self):
        from flax import serialization

        return serialization.to_bytes(
            {**self.state._asdict(), "ema_params": self._ema_params}
        )

    def deserialize_full(self, payload):
        from flax import serialization

        template = {**self.state._asdict(), "ema_params": self._ema_params}
        restored = serialization.from_bytes(template, payload)
        self._ema_params = restored.pop("ema_params")
        self.state = type(self.state)(**restored)
