"""Flax CLIP text tower (on-device language embeddings).

Counterpart of the reference's HF CLIP usage (lang_utils.py:5-36 ViT-L/14
text encoder for ``lang_emb``; obs_nets.py:1204,1311-1320 ViT-B/32
``encode_text`` for the FAST path). The torch towers run on CPU; this is
the TPU-native equivalent: a flax implementation of the CLIP text
transformer (token+position embeddings, pre-LN residual blocks with
quick-GELU MLPs, causal attention, EOS pooling, text projection) plus
``import_clip_text_state_dict`` porting HF ``CLIPTextModelWithProjection``
weights — same pattern as the proven ResNet-18 importer
(utils/torch_import.py).

Embedding parity with the torch tower is asserted in
tests/test_clip_text.py on a randomly-initialized HF model (works
hermetically; with cached pretrained weights the same importer yields
the real CLIP embeddings).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768  # ViT-L/14 text width
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 77
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


def quick_gelu(x):
    """CLIP's activation (HF activations.py quick_gelu)."""
    return x * nn.sigmoid(1.702 * x)


class _Attention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        head = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, name="v_proj")(x)

        def split(t):
            return t.reshape(t.shape[:-1] + (c.num_heads, head)).swapaxes(-3, -2)

        q, k, v = split(q), split(k), split(v)
        att = jnp.einsum("...hqd,...hkd->...hqk", q, k) / jnp.sqrt(head)
        att = jnp.where(mask, att, jnp.finfo(att.dtype).min)
        att = nn.softmax(att, axis=-1)
        out = jnp.einsum("...hqk,...hkd->...hqd", att, v)
        out = out.swapaxes(-3, -2).reshape(x.shape)
        return nn.Dense(c.hidden_size, name="out_proj")(out)


class _Block(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1")(x)
        x = x + _Attention(c, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, name="fc2")(h)
        return x + h


class CLIPTextTower(nn.Module):
    """Text transformer -> EOS-pooled, projected embedding.

    ``__call__(input_ids [B, T] int32) -> text_embeds [B, proj_dim]``
    (HF CLIPTextModelWithProjection.forward semantics: pooled state is
    the hidden state at each sequence's highest token id — the EOS token
    has the largest id in CLIP's vocab).
    """

    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids):
        # language embeddings are computed once per demo (not a hot
        # path); force full fp32 matmuls so TPU bf16-default MXU
        # precision cannot perturb parity with the torch tower
        with jax.default_matmul_precision("float32"):
            return self._forward(input_ids)

    def _forward(self, input_ids):
        c = self.cfg
        B, T = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_positions, c.hidden_size),
        )
        x = tok + pos[None, :T]
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        for i in range(c.num_layers):
            x = _Block(c, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
        # HF semantics: pool at the first EOS token position
        eos_idx = jnp.argmax(
            (input_ids == c.eos_token_id).astype(jnp.int32), axis=-1
        )
        pooled = x[jnp.arange(B), eos_idx]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(0.01),
            (c.hidden_size, c.projection_dim),
        )
        return pooled @ proj


def import_clip_text_state_dict(sd: dict, cfg: CLIPTextConfig) -> dict:
    """HF CLIPTextModelWithProjection state_dict -> flax params."""

    def g(key):
        return np.asarray(sd[key].detach().cpu().numpy()
                          if hasattr(sd[key], "detach") else sd[key])

    p: dict = {
        "token_embedding": {
            "embedding": g("text_model.embeddings.token_embedding.weight")
        },
        "position_embedding": g(
            "text_model.embeddings.position_embedding.weight"
        ),
        "final_layer_norm": {
            "scale": g("text_model.final_layer_norm.weight"),
            "bias": g("text_model.final_layer_norm.bias"),
        },
        "text_projection": g("text_projection.weight").T,
    }
    for i in range(cfg.num_layers):
        pre = f"text_model.encoder.layers.{i}"
        blk = {
            "layer_norm1": {
                "scale": g(f"{pre}.layer_norm1.weight"),
                "bias": g(f"{pre}.layer_norm1.bias"),
            },
            "layer_norm2": {
                "scale": g(f"{pre}.layer_norm2.weight"),
                "bias": g(f"{pre}.layer_norm2.bias"),
            },
            "self_attn": {},
            "fc1": {
                "kernel": g(f"{pre}.mlp.fc1.weight").T,
                "bias": g(f"{pre}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": g(f"{pre}.mlp.fc2.weight").T,
                "bias": g(f"{pre}.mlp.fc2.bias"),
            },
        }
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            blk["self_attn"][proj] = {
                "kernel": g(f"{pre}.self_attn.{proj}.weight").T,
                "bias": g(f"{pre}.self_attn.{proj}.bias"),
            }
        p[f"layers_{i}"] = blk
    return {"params": p}


def load_pretrained_flax_clip(model_name: str = "openai/clip-vit-large-patch14"):
    """Port locally-cached HF weights into the flax tower.

    Returns (tower, variables, tokenizer) or raises if no local weights.
    """
    from transformers import AutoTokenizer, CLIPTextModelWithProjection

    torch_model = CLIPTextModelWithProjection.from_pretrained(
        model_name, local_files_only=True
    )
    tokenizer = AutoTokenizer.from_pretrained(model_name, local_files_only=True)
    hf_cfg = torch_model.config
    cfg = CLIPTextConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_positions=hf_cfg.max_position_embeddings,
        projection_dim=hf_cfg.projection_dim,
        eos_token_id=hf_cfg.eos_token_id,
    )
    tower = CLIPTextTower(cfg)
    variables = import_clip_text_state_dict(torch_model.state_dict(), cfg)
    return tower, variables, tokenizer
