"""Sibling VQ tokenizer variants.

- ``VQVAE``         — plain MLP enc/dec, L2-argmin codebook, straight-through
                      estimator (reference: robomimic/models/vq_vae/backbone.py)
- ``LFQVAE``        — unit-sphere "quantizer" (recon loss only;
                      reference: vq_vae/backbone_lfqvae.py)
- ``SpectralLFQVAE``— LFQVAE with spectral-norm encoder
                      (reference: vq_vae/backbone_lfqvae_lipschitz.py)
- ``LSTMVQVAE``     — 3-layer LSTM enc/dec over [B, 10, D] with *soft*
                      softmax(-dist) quantization + STE
                      (reference: vq_vae/backbone_lstm.py). The reference
                      hardcodes batch 8 x seq 10 (backbone_lstm.py:46) — here
                      the batch is dynamic with seq_len fixed at 10, a
                      knowing fix documented in SURVEY.md §2.3.4.

All return ``(z_latent, loss)`` with ``z_latent`` stop-gradient'ed, matching
the reference tokenizer contract (SURVEY.md A.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import (
    SpectralNormLinear,
    TorchLinear,
    gelu_exact,
)
from lipvq_tpu.ops.vq_lookup import vq_nearest


def uniform_codebook_init(num_embeddings):
    """torch: embedding.weight.data.uniform_(-1/N, 1/N) (backbone.py:36)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / num_embeddings
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class VQVAE(nn.Module):
    """Plain VQ-VAE with straight-through estimator (reference backbone.py)."""

    feature_dim: int
    latent_dim: int
    num_embeddings: int = 128
    commitment_cost: float = 0.25
    use_pallas: bool | None = None

    def setup(self):
        self.enc = [TorchLinear(64), TorchLinear(128), TorchLinear(self.latent_dim)]
        self.dec = [TorchLinear(128), TorchLinear(64), TorchLinear(self.feature_dim)]
        self.embedding = self.param(
            "embedding",
            uniform_codebook_init(self.num_embeddings),
            (self.num_embeddings, self.latent_dim),
            jnp.float32,
        )

    def encode(self, x):
        for layer in self.enc:
            x = jax.nn.relu(layer(x))  # reference ends encoder with ReLU too
        return x

    def decode(self, z):
        for layer in self.dec:
            z = jax.nn.relu(layer(z))  # quirk: output ReLU (backbone.py:31)
        return z

    def quantize(self, z_e):
        ids = vq_nearest(z_e, self.embedding, use_pallas=self.use_pallas)
        ids = jax.lax.stop_gradient(ids)
        z_q = jnp.take(self.embedding, ids, axis=0)
        commitment_loss = self.commitment_cost * jnp.mean(
            (jax.lax.stop_gradient(z_q) - z_e) ** 2
        )
        embedding_loss = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
        quantization_loss = embedding_loss + commitment_loss
        # straight-through estimator (backbone.py:74)
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        return z_q, quantization_loss, ids

    def __call__(self, x):
        z_e = self.encode(x)
        z_q, quantization_loss, ids = self.quantize(z_e)
        z_latent = jax.lax.stop_gradient(z_q)
        x_recon = self.decode(z_q)
        recon_loss = jnp.mean((x_recon - x) ** 2)
        return z_latent, recon_loss + quantization_loss, ids


class LFQVAE(nn.Module):
    """Unit-sphere-normalize 'quantizer'; recon loss only
    (reference backbone_lfqvae.py)."""

    feature_dim: int
    latent_dim: int

    def setup(self):
        self.enc = [TorchLinear(64), TorchLinear(128), TorchLinear(self.latent_dim)]
        self.dec = [TorchLinear(128), TorchLinear(64), TorchLinear(self.feature_dim)]

    def __call__(self, x):
        z_e = x
        for layer in self.enc:
            z_e = jax.nn.relu(layer(z_e))
        # F.normalize(z, p=2, dim=-1): eps-clamped norm (torch eps=1e-12)
        norm = jnp.maximum(jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12)
        z_q = z_e / norm
        z_latent = jax.lax.stop_gradient(z_q)
        h = z_q
        for layer in self.dec:
            h = jax.nn.relu(layer(h))
        recon_loss = jnp.mean((h - x) ** 2)
        return z_latent, recon_loss


class SpectralLFQVAE(nn.Module):
    """LFQVAE variant with spectral-norm encoder
    (reference backbone_lfqvae_lipschitz.py:14-21)."""

    feature_dim: int
    latent_dim: int

    def setup(self):
        self.enc = [
            SpectralNormLinear(64),
            SpectralNormLinear(128),
            SpectralNormLinear(self.latent_dim),
        ]
        self.dec = [TorchLinear(128), TorchLinear(64), TorchLinear(self.feature_dim)]

    def __call__(self, x, update_stats: bool = True):
        z_e = x
        for layer in self.enc:
            z_e = jax.nn.relu(layer(z_e, update_stats=update_stats))
        norm = jnp.maximum(jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12)
        z_q = z_e / norm
        z_latent = jax.lax.stop_gradient(z_q)
        h = z_q
        for layer in self.dec:
            h = jax.nn.relu(layer(h))
        recon_loss = jnp.mean((h - x) ** 2)
        return z_latent, recon_loss


class _LSTMStack(nn.Module):
    """Multi-layer unidirectional LSTM over [B, T, D] via lax.scan."""

    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(features=self.hidden_size)
            rnn = nn.RNN(cell, time_major=False)
            x = rnn(x)
        return x


class LSTMVQVAE(nn.Module):
    """LSTM enc/dec with soft softmax(-dist) quantization + STE
    (reference backbone_lstm.py)."""

    feature_dim: int
    latent_dim: int
    num_embeddings: int = 128
    commitment_cost: float = 0.25
    seq_len: int = 10

    def setup(self):
        self.enc_proj = TorchLinear(self.latent_dim)
        self.enc_lstm = _LSTMStack(self.latent_dim, 3)
        self.dec_proj = TorchLinear(self.feature_dim)
        self.dec_lstm = _LSTMStack(self.feature_dim, 3)
        self.embedding = self.param(
            "embedding",
            uniform_codebook_init(self.num_embeddings),
            (self.num_embeddings, self.latent_dim),
            jnp.float32,
        )

    def quantize(self, z_e):
        # z_e [B, T, L]; soft assignment over codes (backbone_lstm.py:70-91)
        d2 = (
            jnp.sum(z_e**2, axis=-1, keepdims=True)
            + jnp.sum(self.embedding**2, axis=-1)[None, None, :]
            - 2.0
            * jnp.einsum(
                "btl,nl->btn", z_e, self.embedding,
                preferred_element_type=jnp.float32,
            )
        )
        q = jax.nn.softmax(-d2, axis=-1)
        z_q = jnp.einsum(
            "btn,nl->btl", q, self.embedding, preferred_element_type=jnp.float32
        )
        commitment_loss = self.commitment_cost * jnp.mean(
            (jax.lax.stop_gradient(z_q) - z_e) ** 2
        )
        embedding_loss = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        return z_q, embedding_loss + commitment_loss

    def __call__(self, x):
        """x [B*seq_len, feature_dim] flat, windowed into seq_len chunks."""
        bt = x.shape[0]
        b = bt // self.seq_len
        xs = x.reshape(b, self.seq_len, self.feature_dim)
        h = gelu_exact(self.enc_proj(xs))
        z_e = self.enc_lstm(h)
        z_q, quantization_loss = self.quantize(z_e)
        z_latent = jax.lax.stop_gradient(z_q).reshape(bt, -1)
        h = gelu_exact(self.dec_proj(z_q))
        x_recon = self.dec_lstm(h).reshape(bt, self.feature_dim)
        recon_loss = jnp.mean((x_recon - x) ** 2)
        return z_latent, recon_loss + quantization_loss
