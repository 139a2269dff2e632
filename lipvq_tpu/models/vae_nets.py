"""Conditional VAE machinery (flax).

Counterpart of reference models/vae_nets.py (cVAE used by BC-VAE, GL-VAE,
and ACT): encoder q(z|x, cond) -> (mu, logvar), reparameterized sample,
decoder p(x|z, cond), N(0, I) prior (learned-prior variants omitted until
a config needs them), KL divergence and reconstruction losses.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import MLP, TorchLinear


def kl_divergence(mu, logvar):
    """KL(q || N(0, I)) summed over latent dim, averaged over batch."""
    return jnp.mean(
        -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    )


def reparameterize(key, mu, logvar):
    eps = jax.random.normal(key, mu.shape)
    return mu + eps * jnp.exp(0.5 * logvar)


class VAE(nn.Module):
    """MLP cVAE over flat inputs (reference vae_nets.py VAE)."""

    input_dim: int
    latent_dim: int
    cond_dim: int = 0
    encoder_layer_dims: Sequence[int] = (300, 400)
    decoder_layer_dims: Sequence[int] = (300, 400)
    decoder_is_conditioned: bool = True

    def setup(self):
        self.enc_mlp = MLP(self.encoder_layer_dims,
                           self.encoder_layer_dims[-1], activation="relu")
        self.enc_mu = TorchLinear(self.latent_dim)
        self.enc_logvar = TorchLinear(self.latent_dim)
        self.dec_mlp = MLP(self.decoder_layer_dims,
                           self.decoder_layer_dims[-1], activation="relu")
        self.dec_out = TorchLinear(self.input_dim)

    def encode(self, x, cond=None):
        h = x
        if cond is not None:
            h = jnp.concatenate([x, cond], axis=-1)
        h = self.enc_mlp(h)
        return self.enc_mu(h), self.enc_logvar(h)

    def decode(self, z, cond=None):
        h = z
        if self.decoder_is_conditioned and cond is not None:
            h = jnp.concatenate([z, cond], axis=-1)
        return self.dec_out(self.dec_mlp(h))

    def __call__(self, x, cond=None, rng=None):
        mu, logvar = self.encode(x, cond)
        if rng is None:
            rng = self.make_rng("sample")
        z = reparameterize(rng, mu, logvar)
        recon = self.decode(z, cond)
        return {
            "reconstruction": recon,
            "mu": mu,
            "logvar": logvar,
            "z": z,
            "kl_loss": kl_divergence(mu, logvar),
            "reconstruction_loss": jnp.mean((recon - x) ** 2),
        }

    def sample_prior(self, key, batch_size, cond=None):
        z = jax.random.normal(key, (batch_size, self.latent_dim))
        return self.decode(z, cond)
