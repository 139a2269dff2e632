"""Policy actor heads (flax).

Counterpart of reference policy_nets.py. The flagship is
``ICLGMMActorNetwork`` (reference ICLTransformerGMMActorNetwork,
policy_nets.py:2375-2610, and its Mamba twin :2613): the ICL MIMO
composite with GMM output heads

    mean/scale: (num_modes, ac_dim), logits: (num_modes,)
    (reference policy_nets.py:2507-2516)

and distribution assembly with tanh-squashed means + low-noise eval
(policy_nets.py:2549-2560).

Also: ``MLPActorNetwork`` / ``GMMActorNetwork`` / ``RNNGMMActorNetwork``
used by the BC family.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import MLP, TorchLinear
from lipvq_tpu.models.distributions import make_gmm
from lipvq_tpu.models.obs_nets import (
    ICLMIMOTransformer,
    ObsSpec,
    ObservationGroupEncoder,
    obs_spec,
)


def gmm_output_spec(num_modes: int, ac_dim: int) -> ObsSpec:
    return obs_spec(
        {"mean": (num_modes, ac_dim), "scale": (num_modes, ac_dim),
         "logits": (num_modes,)}
    )


class ICLGMMActorNetwork(nn.Module):
    """ICL policy with GMM head over a transformer or mamba backbone."""

    group_specs: ObsSpec
    ac_dim: int
    embed_dim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    context_length: int = 10
    causal: bool = False
    emb_dropout: float = 0.1
    attn_dropout: float = 0.1
    block_output_dropout: float = 0.1
    sinusoidal_embedding: bool = False
    nn_parameter_for_timesteps: bool = True
    activation: str = "gelu"
    remat: bool = False
    compute_dtype: str | None = None
    activation_dtype: str | None = None  # bf16 residual stream (see GPTBackbone)
    backbone: str = "transformer"
    action_input_shape: int = 12
    vq_vae_enabled: bool = False
    bin_enabled: bool = False
    fast_enabled: bool = False
    ln_act_enabled: bool = False
    vq_num_codes: int = 1024
    vq_hidden_dim: int = 128
    vq_ema_codebook: bool = False
    vq_ema_decay: float = 0.99
    encoder_cores: ObsSpec = ()
    num_modes: int = 5
    min_std: float = 1e-4
    std_activation: str = "softplus"
    low_noise_eval: bool = True
    use_tanh: bool = False

    def setup(self):
        self.net = ICLMIMOTransformer(
            group_specs=self.group_specs,
            output_spec=gmm_output_spec(self.num_modes, self.ac_dim),
            backbone=self.backbone,
            embed_dim=self.embed_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            context_length=self.context_length,
            causal=self.causal,
            emb_dropout=self.emb_dropout,
            attn_dropout=self.attn_dropout,
            block_output_dropout=self.block_output_dropout,
            sinusoidal_embedding=self.sinusoidal_embedding,
            nn_parameter_for_timesteps=self.nn_parameter_for_timesteps,
            activation=self.activation,
            remat=self.remat,
            compute_dtype=self.compute_dtype,
            activation_dtype=self.activation_dtype,
            action_input_shape=self.action_input_shape,
            vq_vae_enabled=self.vq_vae_enabled,
            bin_enabled=self.bin_enabled,
            fast_enabled=self.fast_enabled,
            ln_act_enabled=self.ln_act_enabled,
            vq_num_codes=self.vq_num_codes,
            vq_hidden_dim=self.vq_hidden_dim,
            vq_ema_codebook=self.vq_ema_codebook,
            vq_ema_decay=self.vq_ema_decay,
            encoder_cores=self.encoder_cores,
        )

    def forward_train(self, obs, context_obs, actions, goal=None,
                      train: bool = False, low_noise_eval: bool | None = None):
        """Return (GMMParams over [B, T], vq_aux_loss).

        Mirrors reference forward_train (policy_nets.py:2518-2581):
        means tanh-squashed unless use_tanh; eval + low_noise_eval ->
        sigma = 1e-4.
        """
        outputs, aux = self.net(
            obs, context_obs, actions, goal=goal, train=train
        )
        if low_noise_eval is None:
            low_noise_eval = self.low_noise_eval
        low_noise = bool(low_noise_eval) and not train
        dists = make_gmm(
            outputs["mean"],
            outputs["scale"],
            outputs["logits"],
            min_std=self.min_std,
            std_activation=self.std_activation,
            use_tanh_mean=not self.use_tanh,
            low_noise=low_noise,
        )
        return dists, aux

    def __call__(self, obs, context_obs, actions, goal=None,
                 train: bool = False):
        """Sample actions [B, T, ac_dim] (reference forward, :2583-2599)."""
        dists, aux = self.forward_train(
            obs, context_obs, actions, goal=goal, train=train
        )
        key = self.make_rng("sample")
        from lipvq_tpu.models.distributions import gmm_sample

        return gmm_sample(dists, key), aux


class ICLActorNetwork(ICLGMMActorNetwork):
    """Deterministic (non-GMM) ICL policy: same ICL composite, a single
    tanh-squashed ``action`` head.

    Reference counterpart: ``ICLTransformerActorNetwork``
    (policy_nets.py:1562-1736) / ``ICLMambaActorNetwork`` (:1738). NOTE
    the reference classes are dead code as written — their ``forward``
    drops the context stream entirely and calls
    ``super(TransformerActorNetwork, self)`` with ``TransformerActorNetwork``
    not in the MRO (the robocasa configs only ever run the GMM variant).
    This implements the *intended* semantics: the full 3-stream ICL
    forward with a deterministic head (tanh squash per :1729-1732)."""

    def setup(self):
        self.net = ICLMIMOTransformer(
            group_specs=self.group_specs,
            output_spec=obs_spec({"action": (self.ac_dim,)}),
            backbone=self.backbone,
            embed_dim=self.embed_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            context_length=self.context_length,
            causal=self.causal,
            emb_dropout=self.emb_dropout,
            attn_dropout=self.attn_dropout,
            block_output_dropout=self.block_output_dropout,
            sinusoidal_embedding=self.sinusoidal_embedding,
            nn_parameter_for_timesteps=self.nn_parameter_for_timesteps,
            activation=self.activation,
            remat=self.remat,
            compute_dtype=self.compute_dtype,
            activation_dtype=self.activation_dtype,
            action_input_shape=self.action_input_shape,
            vq_vae_enabled=self.vq_vae_enabled,
            bin_enabled=self.bin_enabled,
            fast_enabled=self.fast_enabled,
            ln_act_enabled=self.ln_act_enabled,
            vq_num_codes=self.vq_num_codes,
            vq_hidden_dim=self.vq_hidden_dim,
            vq_ema_codebook=self.vq_ema_codebook,
            vq_ema_decay=self.vq_ema_decay,
            encoder_cores=self.encoder_cores,
        )

    def forward_train(self, obs, context_obs, actions, goal=None,
                      train: bool = False, low_noise_eval: bool | None = None):
        """Return (tanh-squashed action sequence [B, T, ac_dim], vq aux)."""
        outputs, aux = self.net(
            obs, context_obs, actions, goal=goal, train=train
        )
        return jnp.tanh(outputs["action"]), aux

    def __call__(self, obs, context_obs, actions, goal=None,
                 train: bool = False):
        preds, aux = self.forward_train(
            obs, context_obs, actions, goal=goal, train=train
        )
        return preds, aux


class GMMActorNetwork(nn.Module):
    """MLP GMM actor for BC (reference policy_nets.py:429)."""

    group_specs: ObsSpec
    ac_dim: int
    layer_dims: Sequence[int] = (1024, 1024)
    num_modes: int = 5
    min_std: float = 1e-4
    std_activation: str = "softplus"
    low_noise_eval: bool = True
    use_tanh: bool = False
    encoder_cores: ObsSpec = ()

    @nn.compact
    def forward_train(self, obs, goal=None, train: bool = False):
        enc = ObservationGroupEncoder(
            self.group_specs, encoder_cores=self.encoder_cores, name="enc"
        )
        groups = {"obs": obs}
        if goal is not None:
            groups["goal"] = goal
        h = enc(train=train, **groups)
        h = MLP(self.layer_dims, self.layer_dims[-1] if self.layer_dims else 256,
                activation="relu", name="mlp")(h)
        m = self.num_modes
        raw_mean = TorchLinear(m * self.ac_dim, name="mean")(h)
        raw_scale = TorchLinear(m * self.ac_dim, name="scale")(h)
        logits = TorchLinear(m, name="logits")(h)
        raw_mean = raw_mean.reshape(h.shape[0], m, self.ac_dim)
        raw_scale = raw_scale.reshape(h.shape[0], m, self.ac_dim)
        return make_gmm(
            raw_mean, raw_scale, logits,
            min_std=self.min_std, std_activation=self.std_activation,
            use_tanh_mean=not self.use_tanh, low_noise=self.low_noise_eval and not train,
        )

    def __call__(self, obs, goal=None, train: bool = False):
        dists = self.forward_train(obs, goal=goal, train=train)
        from lipvq_tpu.models.distributions import gmm_sample

        return gmm_sample(dists, self.make_rng("sample"))


class TransformerGMMActorNetwork(nn.Module):
    """Non-ICL transformer GMM policy over obs sequences
    (reference policy_nets.py TransformerGMMActorNetwork:1912 — the BC
    transformer baseline)."""

    group_specs: ObsSpec
    ac_dim: int
    embed_dim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    context_length: int = 10
    causal: bool = True
    emb_dropout: float = 0.1
    attn_dropout: float = 0.1
    block_output_dropout: float = 0.1
    sinusoidal_embedding: bool = False
    nn_parameter_for_timesteps: bool = True
    activation: str = "gelu"
    encoder_cores: ObsSpec = ()
    num_modes: int = 5
    min_std: float = 1e-4
    std_activation: str = "softplus"
    low_noise_eval: bool = True
    use_tanh: bool = False

    def setup(self):
        from lipvq_tpu.models.obs_nets import MIMOTransformer

        self.net = MIMOTransformer(
            group_specs=self.group_specs,
            output_spec=gmm_output_spec(self.num_modes, self.ac_dim),
            embed_dim=self.embed_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            context_length=self.context_length,
            causal=self.causal,
            emb_dropout=self.emb_dropout,
            attn_dropout=self.attn_dropout,
            block_output_dropout=self.block_output_dropout,
            sinusoidal_embedding=self.sinusoidal_embedding,
            nn_parameter_for_timesteps=self.nn_parameter_for_timesteps,
            activation=self.activation,
            encoder_cores=self.encoder_cores,
        )

    def forward_train(self, obs, goal=None, train: bool = False,
                      low_noise_eval: bool | None = None):
        outputs = self.net(obs, goal=goal, train=train)
        if low_noise_eval is None:
            low_noise_eval = self.low_noise_eval
        return make_gmm(
            outputs["mean"], outputs["scale"], outputs["logits"],
            min_std=self.min_std, std_activation=self.std_activation,
            use_tanh_mean=not self.use_tanh,
            low_noise=bool(low_noise_eval) and not train,
        )

    def __call__(self, obs, goal=None, train: bool = False):
        from lipvq_tpu.models.distributions import gmm_sample

        dists = self.forward_train(obs, goal=goal, train=train)
        return gmm_sample(dists, self.make_rng("sample"))


class _LSTM(nn.Module):
    hidden_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = nn.RNN(
                nn.OptimizedLSTMCell(features=self.hidden_dim),
                time_major=False, name=f"lstm_{i}",
            )(x)
        return x


class RNNGMMActorNetwork(nn.Module):
    """RNN GMM policy (reference policy_nets.py RNNGMMActorNetwork:783)."""

    group_specs: ObsSpec
    ac_dim: int
    hidden_dim: int = 400
    num_layers: int = 2
    num_modes: int = 5
    min_std: float = 1e-4
    std_activation: str = "softplus"
    low_noise_eval: bool = True
    use_tanh: bool = False
    encoder_cores: ObsSpec = ()

    @nn.compact
    def forward_train(self, obs, goal=None, train: bool = False,
                      low_noise_eval: bool | None = None):
        some = jax.tree.leaves(obs)[0]
        b, t = some.shape[:2]
        enc = ObservationGroupEncoder(
            self.group_specs, encoder_cores=self.encoder_cores, name="enc"
        )
        flat = jax.tree.map(lambda a: a.reshape((b * t,) + a.shape[2:]), obs)
        groups = {"obs": flat}
        if goal is not None:
            groups["goal"] = jax.tree.map(
                lambda a: a.reshape((b * t,) + a.shape[2:]), goal
            )
        h = enc(train=train, **groups).reshape(b, t, -1)
        h = _LSTM(self.hidden_dim, self.num_layers, name="rnn")(h)
        m = self.num_modes
        raw_mean = TorchLinear(m * self.ac_dim, name="mean")(h)
        raw_scale = TorchLinear(m * self.ac_dim, name="scale")(h)
        logits = TorchLinear(m, name="logits")(h)
        raw_mean = raw_mean.reshape(b, t, m, self.ac_dim)
        raw_scale = raw_scale.reshape(b, t, m, self.ac_dim)
        if low_noise_eval is None:
            low_noise_eval = self.low_noise_eval
        return make_gmm(
            raw_mean, raw_scale, logits,
            min_std=self.min_std, std_activation=self.std_activation,
            use_tanh_mean=not self.use_tanh,
            low_noise=bool(low_noise_eval) and not train,
        )

    def __call__(self, obs, goal=None, train: bool = False):
        from lipvq_tpu.models.distributions import gmm_sample

        dists = self.forward_train(obs, goal=goal, train=train)
        return gmm_sample(dists, self.make_rng("sample"))


class ActorNetwork(nn.Module):
    """Deterministic MLP actor with tanh output (reference policy_nets.py:34)."""

    group_specs: ObsSpec
    ac_dim: int
    layer_dims: Sequence[int] = (1024, 1024)
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
        h = MLP(self.layer_dims, self.layer_dims[-1] if self.layer_dims else 256,
                activation="relu", name="mlp")(h)
        return jnp.tanh(TorchLinear(self.ac_dim, name="out")(h))
