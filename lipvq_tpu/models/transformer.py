"""minGPT-style transformer backbone (flax).

Semantics match the reference GPT backbone
(reference: robomimic/models/transformers.py:80-440): pre-LN blocks,
QKV projection without bias, causal-or-full mask filled at construction
(transformers.py:146-151 — ``causal=False`` yields *bidirectional*
attention, which is what the ICL template uses), GELU or GEGLU MLP with
hidden 4x (GEGLU doubles the first projection, transformers.py:279-290),
attention+output dropout, final LayerNorm, N(0, 0.02) linear init.

TPU notes: at the ICL scale (T = 3*context_length = 30, D = 512) attention
is a handful of small MXU matmuls — XLA fuses this fine; a Pallas flash
kernel would add launch overhead for nothing. The einsum forms below keep
heads batched so the MXU sees [B*NH, T, DH] GEMMs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import gelu_exact

# reference GPT_Backbone._init_weights: N(0, 0.02) weights, zero bias
GPT_KERNEL_INIT = jax.nn.initializers.normal(stddev=0.02)


class GEGLU(nn.Module):
    """a * gelu(b) over a channel split (reference transformers.py:18-32)."""

    @nn.compact
    def __call__(self, x):
        a, b = jnp.split(x, 2, axis=-1)
        return a * gelu_exact(b)


def sinusoidal_position_encoding(timesteps: jax.Array, embed_dim: int) -> jax.Array:
    """Standard sin/cos positional encoding (reference transformers.py:35-77).

    timesteps: [B, T] float -> [B, T, embed_dim].
    """
    half = np.arange(0, embed_dim, 2)
    div_term = jnp.exp(jnp.asarray(half) * (-jnp.log(10000.0) / embed_dim))
    args = timesteps[..., None] * div_term[None, None, :]
    pe = jnp.zeros(timesteps.shape + (embed_dim,))
    pe = pe.at[..., 0::2].set(jnp.sin(args))
    pe = pe.at[..., 1::2].set(jnp.cos(args))
    return jax.lax.stop_gradient(pe)


class SelfAttention(nn.Module):
    """Multi-head self-attention with construction-time mask
    (reference transformers.py:80-206).

    ``compute_dtype="bfloat16"`` runs the projections and attention
    matmuls in bf16 on the MXU (params stay fp32, softmax and
    accumulation stay fp32) — the TPU mixed-precision recipe."""

    embed_dim: int
    num_heads: int
    context_length: int
    causal: bool = True
    attn_dropout: float = 0.1
    output_dropout: float = 0.1
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, d = x.shape
        assert d == self.embed_dim, (d, self.embed_dim)
        assert t <= self.context_length, (t, self.context_length)
        nh = self.num_heads
        dh = d // nh
        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None

        qkv = nn.Dense(
            3 * d, use_bias=False, kernel_init=GPT_KERNEL_INIT, name="qkv",
            dtype=cd,
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)

        att = jnp.einsum(
            "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / jnp.sqrt(dh).astype(jnp.float32))
        if self.causal:
            mask = jnp.tril(jnp.ones((t, t), bool))
            att = jnp.where(mask[None, None], att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.attn_dropout, deterministic=not train)(att)
        if cd is not None:
            att = att.astype(cd)  # fp32 softmax result -> bf16 for the MXU
        y = jnp.einsum("bhts,bhsd->bhtd", att, v, preferred_element_type=jnp.float32)
        y = y.astype(x.dtype)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
        y = nn.Dense(
            d, kernel_init=GPT_KERNEL_INIT, bias_init=jax.nn.initializers.zeros,
            name="output", dtype=cd,
        )(y)
        y = nn.Dropout(self.output_dropout, deterministic=not train)(y)
        return y


class SelfAttentionBlock(nn.Module):
    """Pre-LN transformer block (reference transformers.py:225-302)."""

    embed_dim: int
    num_heads: int
    context_length: int
    causal: bool = True
    attn_dropout: float = 0.1
    output_dropout: float = 0.1
    activation: str = "gelu"
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        attn = SelfAttention(
            self.embed_dim,
            self.num_heads,
            self.context_length,
            causal=self.causal,
            attn_dropout=self.attn_dropout,
            output_dropout=self.output_dropout,
            compute_dtype=self.compute_dtype,
            name="attention",
        )
        # residual stream + LayerNorms stay fp32 for stability
        x = x + attn(nn.LayerNorm(name="ln1")(x), train=train)

        h = nn.LayerNorm(name="ln2")(x)
        mult = 2 if self.activation == "geglu" else 1
        h = nn.Dense(
            4 * self.embed_dim * mult, kernel_init=GPT_KERNEL_INIT,
            bias_init=jax.nn.initializers.zeros, name="mlp_fc", dtype=cd,
        )(h)
        h = GEGLU()(h) if self.activation == "geglu" else gelu_exact(h)
        h = nn.Dense(
            self.embed_dim, kernel_init=GPT_KERNEL_INIT,
            bias_init=jax.nn.initializers.zeros, name="mlp_proj", dtype=cd,
        )(h)
        h = h.astype(x.dtype)
        h = nn.Dropout(self.output_dropout, deterministic=not train)(h)
        return x + h


class GPTBackbone(nn.Module):
    """Stack of SelfAttentionBlocks + output LayerNorm
    (reference transformers.py:321-440)."""

    embed_dim: int
    context_length: int
    causal: bool = True
    attn_dropout: float = 0.1
    block_output_dropout: float = 0.1
    num_layers: int = 6
    num_heads: int = 8
    activation: str = "gelu"
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM)
    compute_dtype: str | None = None  # "bfloat16" -> MXU mixed precision
    # "bfloat16" keeps the RESIDUAL STREAM (and therefore every saved
    # activation of the backbone) in bf16 end-to-end: the measured
    # round-3 roofline showed the saturated train step runs at ~101% of
    # its HBM-bytes floor with fp32 activations, so halving activation
    # traffic — not faster matmuls — is the lever. Params, LayerNorm
    # statistics (fp32 via flax dtype promotion against fp32 params),
    # attention logits/softmax, and the final output all stay fp32.
    # Pair with compute_dtype="bfloat16" or the Dense promotions undo
    # most of the savings.
    activation_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[1:] == (self.context_length, self.embed_dim), x.shape
        if self.activation_dtype is not None:
            x = x.astype(jnp.dtype(self.activation_dtype))
        block_cls = SelfAttentionBlock
        if self.remat:
            block_cls = nn.remat(SelfAttentionBlock,
                                 static_argnums=(2,))
        for i in range(self.num_layers):
            x = block_cls(
                self.embed_dim,
                self.num_heads,
                self.context_length,
                causal=self.causal,
                attn_dropout=self.attn_dropout,
                output_dropout=self.block_output_dropout,
                activation=self.activation,
                compute_dtype=self.compute_dtype,
                name=f"block_{i}",
            )(x, train)
        return nn.LayerNorm(name="output_ln")(x)
