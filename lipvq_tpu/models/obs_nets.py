"""Observation encoder/decoder stack + ICL composites (flax).

Counterpart of the reference's obs_nets
(reference: robomimic/models/obs_nets.py):

- ``ObservationEncoder``      — per-key cores, concat features (ref :240)
- ``ObservationGroupEncoder`` — one encoder per obs group, concat (ref :870)
- ``ObservationDecoder``      — one linear head per output key (ref :714)
- ``ICLObservationGroupEncoder`` — group encoder + the selected *action
  tokenizer* applied to the prompt action stream (ref :1120; ctor switch
  :1199-1260, forward switch :1306-1344)
- ``ICLMIMOTransformer``      — 3-stream embed, [ctx_obs, ctx_act]
  interleave + query obs concat -> GPT over 3*T tokens -> decode last T
  (ref :2336; interleave :2584-2596, decode :2602-2609)

Design notes (TPU-first):
- modules are pure; the reference's ``icl_time_distributed`` reshuffle
  (tensor_utils.py:1045-1090) collapses to two reshapes under jit;
- the VQ aux loss is *returned*, not side-channeled through attributes
  (reference obs_nets.py:2576-2577): the jitted train step computes both
  policy and tokenizer grads from one forward;
- obs shapes are static module attributes (tuples), so jit re-traces only
  on real shape changes.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import (
    SpectralNormLinear,
    TorchLinear,
    gelu_exact,
    get_activation,
)
from lipvq_tpu.models.tokenizers.bin_action import AdaptiveBinActionEmbedding
from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE
from lipvq_tpu.models.transformer import (
    GPTBackbone,
    sinusoidal_position_encoding,
)

# (key, shape) static spec type used across modules
ObsSpec = tuple  # tuple[tuple[str, tuple[int, ...]], ...]


def obs_spec(shapes: dict | Sequence) -> ObsSpec:
    """Normalize {key: shape} to a hashable ((key, shape), ...) spec."""
    if isinstance(shapes, dict):
        items = shapes.items()
    else:
        items = shapes
    return tuple((k, tuple(v)) for k, v in items)


def spec_flat_dim(spec: ObsSpec) -> int:
    total = 0
    for _, shape in spec:
        n = 1
        for s in shape:
            n *= s
        total += n
    return total


def spec_encoded_dim(spec: ObsSpec, encoder_cores: ObsSpec = ()) -> int:
    """Post-encoder feature dim: visual-core keys contribute their
    feature_dimension, low-dim keys their flat size."""
    core_map = dict(encoder_cores)
    total = 0
    for key, shape in spec:
        core = core_map.get(key)
        if core:
            feat = 64
            if ":" in core:
                for pair in core.split(":", 1)[1].split(","):
                    k, v = pair.split("=")
                    if k == "feature_dimension":
                        feat = int(v)
            total += feat
        else:
            n = 1
            for s in shape:
                n *= s
            total += n
    return total


class ObservationEncoder(nn.Module):
    """Encode an observation dict into one flat feature vector.

    Low-dim keys pass through flattened (core None); visual keys go
    through their registered core (VisualCore etc. — see obs_core.py).
    Keys are processed in spec order (deterministic, matching the
    reference's OrderedDict semantics, obs_nets.py:292-296).
    """

    spec: ObsSpec
    feature_activation: str | None = "relu"
    encoder_cores: ObsSpec = ()  # ((key, core_name), ...) — empty = identity

    @nn.compact
    def __call__(self, obs_dict, train: bool = False):
        from lipvq_tpu.models.obs_core import build_core  # lazy: avoid cycle

        core_map = dict(self.encoder_cores)
        feats = []
        for key, shape in self.spec:
            x = obs_dict[key]
            core_name = core_map.get(key)
            if core_name:
                core = build_core(core_name, key, shape, name=f"core_{key}")
                if "LanguageConditioned" in core_name:
                    # FiLM cores condition on the lang_emb obs key
                    # (reference VisualCoreLanguageConditioned forward,
                    # obs_core.py:291-298)
                    f = core(x, train=train,
                             lang_emb=obs_dict.get("lang_emb"))
                else:
                    f = core(x, train=train)
            else:
                f = x.reshape(x.shape[0], -1)
            feats.append(f)
        out = jnp.concatenate(feats, axis=-1)
        if self.feature_activation:
            out = get_activation(self.feature_activation)(out)
        return out


class ObservationGroupEncoder(nn.Module):
    """One ObservationEncoder per group; concat outputs
    (reference obs_nets.py:870)."""

    group_specs: ObsSpec  # ((group, spec), ...)
    feature_activation: str | None = None
    encoder_cores: ObsSpec = ()

    def setup(self):
        self.encoders = {
            group: ObservationEncoder(
                spec,
                feature_activation=self.feature_activation,
                encoder_cores=self.encoder_cores,
                name=f"enc_{group}",
            )
            for group, spec in self.group_specs
        }

    def __call__(self, train: bool = False, **inputs):
        outs = []
        for group, _ in self.group_specs:
            outs.append(self.encoders[group](inputs[group], train=train))
        return jnp.concatenate(outs, axis=-1)


class ObservationDecoder(nn.Module):
    """One linear head per output key, reshaped to the key's shape
    (reference obs_nets.py:714-771)."""

    spec: ObsSpec

    @nn.compact
    def __call__(self, feats):
        out = {}
        for key, shape in self.spec:
            n = 1
            for s in shape:
                n *= s
            y = TorchLinear(n, name=f"head_{key}")(feats)
            out[key] = y.reshape(y.shape[:-1] + tuple(shape))
        return out


class RawActionTokenizer(nn.Module):
    """Default (all switches false) tokenizer: spectral-norm MLP +
    4-layer TransformerEncoder over the batch-of-timesteps axis
    (reference obs_nets.py:1244-1260).

    The reference feeds [B*T, D] through nn.TransformerEncoder, which
    (batch_first=False) treats B*T as the *sequence* axis of a single
    unbatched sequence — attention mixes all timesteps of all batch
    elements. Faithfully odd; reproduced here with the same shape
    interpretation (one sequence of length B*T).
    """

    output_dim: int
    num_layers: int = 4
    num_heads: int = 8
    dim_feedforward: int = 256

    @nn.compact
    def __call__(self, actions, train: bool = False):
        h = gelu_exact(SpectralNormLinear(64, name="sn1")(actions, update_stats=train))
        h = gelu_exact(SpectralNormLinear(128, name="sn2")(h, update_stats=train))
        h = SpectralNormLinear(self.output_dim, name="sn3")(h, update_stats=train)
        # torch TransformerEncoderLayer default: post-LN, MHA with bias
        x = h[None]  # [1, B*T, D] — single sequence (see docstring)
        # the reference constructs nn.TransformerEncoderLayer(d_model=obs
        # feature dim, nhead=8) which crashes when 8 does not divide the
        # feature dim; fall back to 1 head in that case (knowing fix)
        heads = self.num_heads if self.output_dim % self.num_heads == 0 else 1
        for i in range(self.num_layers):
            attn_out = nn.MultiHeadDotProductAttention(
                num_heads=heads, name=f"attn_{i}"
            )(x, x)
            x = nn.LayerNorm(name=f"ln1_{i}")(x + attn_out)
            ff = TorchLinear(self.dim_feedforward, name=f"ff1_{i}")(x)
            ff = gelu_exact(ff)
            ff = TorchLinear(self.output_dim, name=f"ff2_{i}")(ff)
            x = nn.LayerNorm(name=f"ln2_{i}")(x + ff)
        x = x[0]
        return TorchLinear(self.output_dim, name="out")(x)


class LnActTokenizer(nn.Module):
    """ln_act path: Mamba SSM block over [B, T, A] then MLP projection
    (reference obs_nets.py:1228-1242)."""

    action_dim: int
    output_dim: int
    seq_len: int = 10
    d_state: int = 8
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, actions, train: bool = False):
        from lipvq_tpu.models.mamba import MambaBlock  # lazy: avoid cycle

        bt = actions.shape[0]
        b = bt // self.seq_len
        xs = actions.reshape(b, self.seq_len, self.action_dim)
        xs = MambaBlock(
            d_model=self.action_dim,
            d_state=self.d_state,
            d_conv=self.d_conv,
            expand=self.expand,
            name="mamba",
        )(xs)
        h = xs.reshape(bt, self.action_dim)
        h = gelu_exact(TorchLinear(64, name="p1")(h))
        h = gelu_exact(TorchLinear(128, name="p2")(h))
        return TorchLinear(self.output_dim, name="p3")(h)


class ICLObservationGroupEncoder(nn.Module):
    """Group encoder + prompt-action tokenizer (reference obs_nets.py:1120).

    forward consumes flattened [B*T, ...] inputs for the query obs, the
    prompt obs, and the prompt actions, and returns
    (obs_feat, ctx_obs_feat, ctx_act_feat, vq_aux_loss).
    """

    group_specs: ObsSpec
    action_input_shape: int
    vq_vae_enabled: bool = False
    bin_enabled: bool = False
    fast_enabled: bool = False
    ln_act_enabled: bool = False
    seq_len: int = 10
    vq_num_codes: int = 1024
    vq_hidden_dim: int = 128
    vq_ema_codebook: bool = False
    vq_ema_decay: float = 0.99
    encoder_cores: ObsSpec = ()

    def setup(self):
        self.group_encoder = ObservationGroupEncoder(
            self.group_specs,
            feature_activation=None,  # reference passes None (obs_nets.py:2417)
            encoder_cores=self.encoder_cores,
        )
        out_dim = self.output_dim
        if self.fast_enabled:
            # FAST path: host-side DCT+BPE tokens -> CLIP text features are
            # computed in the data pipeline (see tokenizers/fast.py); here the
            # 512-d CLIP features are projected like the reference MLP
            # (obs_nets.py:1206-1212).
            self.fast_proj = [TorchLinear(64), TorchLinear(128), TorchLinear(out_dim)]
        elif self.bin_enabled:
            self.action_network = AdaptiveBinActionEmbedding(
                action_dim=self.action_input_shape, output_dim=out_dim
            )
        elif self.vq_vae_enabled:
            self.action_network = LipVQVAE(
                feature_dim=self.action_input_shape,
                latent_dim=out_dim,
                num_codes=self.vq_num_codes,
                hidden_dim=self.vq_hidden_dim,
                ema_codebook=self.vq_ema_codebook,
                ema_decay=self.vq_ema_decay,
            )
        elif self.ln_act_enabled:
            self.action_network = LnActTokenizer(
                action_dim=self.action_input_shape,
                output_dim=out_dim,
                seq_len=self.seq_len,
            )
        else:
            self.action_network = RawActionTokenizer(output_dim=out_dim)

    @property
    def output_dim(self) -> int:
        """Post-encoder concat dim over all groups (visual-core keys count
        their feature_dimension, low-dim keys their flat size) — this is
        the tokenizer latent dim (reference obs_nets.py:1193)."""
        total = 0
        for _, spec in self.group_specs:
            total += spec_encoded_dim(spec, self.encoder_cores)
        return total

    def __call__(self, obs, prompt_obs, prompt_actions, goal=None,
                 train: bool = False):
        groups = {"obs": obs}
        if goal is not None:
            groups["goal"] = goal
        obs_feat = self.group_encoder(train=train, **groups)
        ctx_groups = {"obs": prompt_obs}
        if goal is not None:
            ctx_groups["goal"] = goal
        ctx_obs_feat = self.group_encoder(train=train, **ctx_groups)

        aux_loss = jnp.zeros((), jnp.float32)
        if self.fast_enabled:
            h = prompt_actions  # [B*T, 512] precomputed CLIP features
            for i, layer in enumerate(self.fast_proj):
                h = layer(h) if i == len(self.fast_proj) - 1 else gelu_exact(layer(h))
            ctx_act_feat = h
        elif self.vq_vae_enabled:
            ctx_act_feat, aux_loss, _ids = self.action_network(prompt_actions)
        elif self.bin_enabled:
            ctx_act_feat = self.action_network(prompt_actions, update_stats=train)
        elif self.ln_act_enabled:
            ctx_act_feat = self.action_network(prompt_actions, train=train)
        else:
            ctx_act_feat = self.action_network(prompt_actions, train=train)
        return obs_feat, ctx_obs_feat, ctx_act_feat, aux_loss


class MIMOTransformer(nn.Module):
    """Non-ICL MIMO transformer: encode obs per timestep -> embed +
    positional -> GPT over T tokens -> decode each timestep
    (reference obs_nets.py MIMO_Transformer:1802 — used by the BC
    transformer baselines, SURVEY.md Appendix B.1)."""

    group_specs: ObsSpec
    output_spec: ObsSpec
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
    remat: bool = False
    compute_dtype: str | None = None
    activation_dtype: str | None = None  # bf16 residual stream (see GPTBackbone)
    encoder_cores: ObsSpec = ()

    def setup(self):
        self.encoder = ObservationGroupEncoder(
            self.group_specs, feature_activation=None,
            encoder_cores=self.encoder_cores,
        )
        self.embed_encoder = TorchLinear(self.embed_dim)
        self.embed_ln = nn.LayerNorm()
        self.embed_drop = nn.Dropout(self.emb_dropout)
        if self.nn_parameter_for_timesteps:
            self.embed_timestep = self.param(
                "embed_timestep", jax.nn.initializers.zeros,
                (1, self.context_length, self.embed_dim), jnp.float32,
            )
        self.transformer = GPTBackbone(
            embed_dim=self.embed_dim,
            context_length=self.context_length,
            causal=self.causal,
            attn_dropout=self.attn_dropout,
            block_output_dropout=self.block_output_dropout,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            activation=self.activation,
            remat=self.remat,
            compute_dtype=self.compute_dtype,
            activation_dtype=self.activation_dtype,
        )
        self.decoder = ObservationDecoder(self.output_spec)

    def __call__(self, obs, goal=None, train: bool = False):
        some_leaf = jax.tree.leaves(obs)[0]
        b, t = some_leaf.shape[:2]
        flat = lambda tree: jax.tree.map(
            lambda a: a.reshape((b * t,) + a.shape[2:]), tree
        )
        groups = {"obs": flat(obs)}
        if goal is not None:
            groups["goal"] = flat(goal)
        feats = self.encoder(train=train, **groups).reshape(b, t, -1)
        emb = self.embed_encoder(feats)
        if self.sinusoidal_embedding:
            ts = jnp.broadcast_to(
                jnp.arange(t, dtype=jnp.float32)[None, :], (b, t)
            )
            emb = emb + sinusoidal_position_encoding(ts, self.embed_dim)
        elif self.nn_parameter_for_timesteps:
            emb = emb + self.embed_timestep[:, :t]
        emb = self.embed_drop(self.embed_ln(emb), deterministic=not train)
        hidden = self.transformer(emb, train=train)
        return self.decoder(hidden)


class ICLMIMOTransformer(nn.Module):
    """ICL composite: 3-stream embedding -> interleave -> backbone -> decode
    (reference obs_nets.py:2336-2611 for the GPT variant; the Mamba variant
    ICL_MIMO_Mamba, obs_nets.py:2635-2884, shares everything but the
    backbone — factored here behind the ``backbone`` switch per SURVEY.md
    Appendix B.7)."""

    group_specs: ObsSpec
    output_spec: ObsSpec
    backbone: str = "transformer"  # "transformer" | "mamba"
    mamba_d_state: int = 8
    mamba_d_conv: int = 4
    mamba_expand: int = 2
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

    def setup(self):
        self.encoder = ICLObservationGroupEncoder(
            group_specs=self.group_specs,
            action_input_shape=self.action_input_shape,
            vq_vae_enabled=self.vq_vae_enabled,
            bin_enabled=self.bin_enabled,
            fast_enabled=self.fast_enabled,
            ln_act_enabled=self.ln_act_enabled,
            seq_len=self.context_length,
            vq_num_codes=self.vq_num_codes,
            vq_hidden_dim=self.vq_hidden_dim,
            vq_ema_codebook=self.vq_ema_codebook,
            vq_ema_decay=self.vq_ema_decay,
            encoder_cores=self.encoder_cores,
        )
        self.embed_encoder = TorchLinear(self.embed_dim)
        self.embed_ln = nn.LayerNorm()
        self.embed_drop = nn.Dropout(self.emb_dropout)
        if self.nn_parameter_for_timesteps:
            assert not self.sinusoidal_embedding
            self.embed_timestep = self.param(
                "embed_timestep",
                jax.nn.initializers.zeros,
                (1, self.context_length, self.embed_dim),
                jnp.float32,
            )
        elif not self.sinusoidal_embedding:
            # learned per-timestep embedding table (torch nn.Embedding: N(0,1))
            self.embed_timestep_table = self.param(
                "embed_timestep_table",
                jax.nn.initializers.normal(stddev=1.0),
                (self.context_length, self.embed_dim),
                jnp.float32,
            )
        if self.backbone == "mamba":
            from lipvq_tpu.models.mamba import MambaBackbone

            self.transformer = MambaBackbone(
                d_model=self.embed_dim,
                num_layers=self.num_layers,
                d_state=self.mamba_d_state,
                d_conv=self.mamba_d_conv,
                expand=self.mamba_expand,
            )
        else:
            self.transformer = GPTBackbone(
                embed_dim=self.embed_dim,
                context_length=self.context_length * 3,  # obs + interleaved ctx
                causal=self.causal,
                attn_dropout=self.attn_dropout,
                block_output_dropout=self.block_output_dropout,
                num_layers=self.num_layers,
                num_heads=self.num_heads,
                activation=self.activation,
                remat=self.remat,
                compute_dtype=self.compute_dtype,
                activation_dtype=self.activation_dtype,
            )
        self.decoder = ObservationDecoder(self.output_spec)

    def input_embedding(self, feats, train: bool = False):
        """Linear embed + positional + LN + dropout (reference
        obs_nets.py:2525-2543). feats [B, T, D_in]."""
        emb = self.embed_encoder(feats)
        if self.sinusoidal_embedding:
            ts = jnp.broadcast_to(
                jnp.arange(emb.shape[1], dtype=jnp.float32)[None, :],
                emb.shape[:2],
            )
            emb = emb + sinusoidal_position_encoding(ts, self.embed_dim)
        elif self.nn_parameter_for_timesteps:
            emb = emb + self.embed_timestep
        else:
            emb = emb + self.embed_timestep_table[None, : emb.shape[1]]
        emb = self.embed_ln(emb)
        emb = self.embed_drop(emb, deterministic=not train)
        return emb

    def __call__(self, obs, prompt_obs, prompt_actions, goal=None,
                 train: bool = False):
        """All obs leaves [B, T, ...]; prompt_actions [B, T, A].

        Returns (outputs dict of [B, T, ...], vq_aux_loss).
        """
        some_leaf = jax.tree.leaves(obs)[0]
        b, t = some_leaf.shape[:2]
        flat = lambda tree: jax.tree.map(
            lambda a: a.reshape((b * t,) + a.shape[2:]), tree
        )
        obs_f, ctx_obs_f, ctx_act_f, aux = self.encoder(
            flat(obs), flat(prompt_obs), flat(prompt_actions),
            goal=flat(goal) if goal is not None else None, train=train,
        )
        unflat = lambda a: a.reshape(b, t, -1)
        obs_emb = self.input_embedding(unflat(obs_f), train=train)
        ctx_obs_emb = self.input_embedding(unflat(ctx_obs_f), train=train)
        ctx_act_emb = self.input_embedding(unflat(ctx_act_f), train=train)

        # interleave [ctx_obs_0, ctx_act_0, ctx_obs_1, ...] then append the
        # T query-obs tokens (reference obs_nets.py:2584-2596)
        interleaved = jnp.stack([ctx_obs_emb, ctx_act_emb], axis=2).reshape(
            b, 2 * t, self.embed_dim
        )
        tokens = jnp.concatenate([interleaved, obs_emb], axis=1)  # [B, 3T, D]
        hidden = self.transformer(tokens, train=train)
        out_tokens = hidden[:, -t:]  # decode last T (reference :2602-2605)
        outputs = self.decoder(out_tokens)
        return outputs, aux
