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
    """MLP cVAE over flat inputs (reference vae_nets.py VAE).

    Priors (reference vae prior config, base vae_defaults):
    - default: fixed N(0, I)
    - ``prior_learn``: learned diagonal Gaussian — analytic KL(q||p);
      with ``prior_is_conditioned`` the prior params come from an MLP
      over the conditioning features
    - ``prior_use_gmm``: learned GMM prior (``prior_gmm_num_modes``
      modes) — KL estimated by the sampled form log q(z) - log p(z)
      (no closed form exists)
    Categorical priors are not yet implemented (COVERAGE.md).
    """

    input_dim: int
    latent_dim: int
    cond_dim: int = 0
    encoder_layer_dims: Sequence[int] = (300, 400)
    decoder_layer_dims: Sequence[int] = (300, 400)
    decoder_is_conditioned: bool = True
    prior_learn: bool = False
    prior_is_conditioned: bool = False
    prior_use_gmm: bool = False
    prior_gmm_num_modes: int = 10
    prior_gmm_learn_weights: bool = False
    prior_use_categorical: bool = False
    prior_categorical_dim: int = 10
    prior_categorical_gumbel_temp: float = 1.0
    prior_layer_dims: Sequence[int] = (300, 400)

    def setup(self):
        self.enc_mlp = MLP(self.encoder_layer_dims,
                           self.encoder_layer_dims[-1], activation="relu")
        if self.prior_use_categorical:
            # latent = latent_dim categorical groups of categorical_dim
            # classes, relaxed with Gumbel-softmax (reference vae prior
            # categorical settings; static temperature this round)
            self.enc_logits = TorchLinear(
                self.latent_dim * self.prior_categorical_dim
            )
        else:
            self.enc_mu = TorchLinear(self.latent_dim)
            self.enc_logvar = TorchLinear(self.latent_dim)
        self.dec_mlp = MLP(self.decoder_layer_dims,
                           self.decoder_layer_dims[-1], activation="relu")
        self.dec_out = TorchLinear(self.input_dim)
        if self.prior_learn:
            m = self.prior_gmm_num_modes if self.prior_use_gmm else 1
            if self.prior_is_conditioned:
                self.prior_mlp = MLP(self.prior_layer_dims,
                                     self.prior_layer_dims[-1],
                                     activation="relu")
                self.prior_mu = TorchLinear(m * self.latent_dim)
                self.prior_logvar = TorchLinear(m * self.latent_dim)
                if self.prior_use_gmm and self.prior_gmm_learn_weights:
                    self.prior_logits = TorchLinear(m)
            else:
                self.prior_mu_p = self.param(
                    "prior_mu", jax.nn.initializers.zeros,
                    (m, self.latent_dim), jnp.float32,
                )
                self.prior_logvar_p = self.param(
                    "prior_logvar", jax.nn.initializers.zeros,
                    (m, self.latent_dim), jnp.float32,
                )
                if self.prior_use_gmm and self.prior_gmm_learn_weights:
                    self.prior_logits_p = self.param(
                        "prior_logits", jax.nn.initializers.zeros, (m,),
                        jnp.float32,
                    )

    def _prior_params(self, cond, batch: int):
        """-> (mu [B, M, D], logvar [B, M, D], logits [B, M])."""
        m = self.prior_gmm_num_modes if self.prior_use_gmm else 1
        if self.prior_is_conditioned:
            assert cond is not None
            h = self.prior_mlp(cond)
            mu = self.prior_mu(h).reshape(batch, m, self.latent_dim)
            logvar = self.prior_logvar(h).reshape(batch, m, self.latent_dim)
            if self.prior_use_gmm and self.prior_gmm_learn_weights:
                logits = self.prior_logits(h)
            else:
                logits = jnp.zeros((batch, m))
        else:
            mu = jnp.broadcast_to(
                self.prior_mu_p[None], (batch, m, self.latent_dim)
            )
            logvar = jnp.broadcast_to(
                self.prior_logvar_p[None], (batch, m, self.latent_dim)
            )
            if self.prior_use_gmm and self.prior_gmm_learn_weights:
                logits = jnp.broadcast_to(self.prior_logits_p[None],
                                          (batch, m))
            else:
                logits = jnp.zeros((batch, m))
        return mu, logvar, logits

    def _kl(self, mu, logvar, z, cond):
        if not self.prior_learn:
            return kl_divergence(mu, logvar)
        b = mu.shape[0]
        p_mu, p_logvar, p_logits = self._prior_params(cond, b)
        if not self.prior_use_gmm:
            pm, pv = p_mu[:, 0], p_logvar[:, 0]
            # analytic KL between diagonal gaussians
            kl = 0.5 * jnp.sum(
                pv - logvar
                + (jnp.exp(logvar) + (mu - pm) ** 2) / jnp.exp(pv)
                - 1.0,
                axis=-1,
            )
            return jnp.mean(kl)
        # sampled KL: log q(z|x) - log p(z)
        log_q = jnp.sum(
            -0.5 * (((z - mu) ** 2) / jnp.exp(logvar) + logvar
                    + jnp.log(2 * jnp.pi)),
            axis=-1,
        )
        comp = jnp.sum(
            -0.5 * (((z[:, None] - p_mu) ** 2) / jnp.exp(p_logvar)
                    + p_logvar + jnp.log(2 * jnp.pi)),
            axis=-1,
        )  # [B, M]
        log_p = jax.nn.logsumexp(
            comp + jax.nn.log_softmax(p_logits, axis=-1), axis=-1
        )
        return jnp.mean(log_q - log_p)

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

    def _categorical_forward(self, x, cond, rng):
        h = x if cond is None else jnp.concatenate([x, cond], axis=-1)
        h = self.enc_mlp(h)
        logits = self.enc_logits(h).reshape(
            -1, self.latent_dim, self.prior_categorical_dim
        )
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logits.shape, minval=1e-10, maxval=1.0)
        ))
        z_soft = jax.nn.softmax(
            (logits + g) / self.prior_categorical_gumbel_temp, axis=-1
        )
        z = z_soft.reshape(z_soft.shape[0], -1)
        probs = jax.nn.softmax(logits, axis=-1)
        kl = jnp.mean(jnp.sum(
            probs * (jnp.log(probs + 1e-10)
                     + jnp.log(float(self.prior_categorical_dim))),
            axis=(-2, -1),
        ))
        recon = self.decode(z, cond)
        return {
            "reconstruction": recon,
            "logits": logits,
            "z": z,
            "kl_loss": kl,
            "mu": jnp.zeros((z.shape[0], self.latent_dim)),
            "logvar": jnp.zeros((z.shape[0], self.latent_dim)),
            "reconstruction_loss": jnp.mean((recon - x) ** 2),
        }

    def __call__(self, x, cond=None, rng=None):
        if rng is None:
            rng = self.make_rng("sample")
        if self.prior_use_categorical:
            return self._categorical_forward(x, cond, rng)
        mu, logvar = self.encode(x, cond)
        z = reparameterize(rng, mu, logvar)
        recon = self.decode(z, cond)
        return {
            "reconstruction": recon,
            "mu": mu,
            "logvar": logvar,
            "z": z,
            "kl_loss": self._kl(mu, logvar, z, cond),
            "reconstruction_loss": jnp.mean((recon - x) ** 2),
        }

    def sample_prior(self, key, batch_size, cond=None):
        if self.prior_use_categorical:
            cat = jax.random.randint(
                key, (batch_size, self.latent_dim), 0,
                self.prior_categorical_dim,
            )
            z = jax.nn.one_hot(cat, self.prior_categorical_dim).reshape(
                batch_size, -1
            )
            return self.decode(z, cond)
        if self.prior_learn:
            k_mode, k_normal = jax.random.split(key)
            p_mu, p_logvar, p_logits = self._prior_params(cond, batch_size)
            mode = jax.random.categorical(k_mode, p_logits, axis=-1)
            oh = jax.nn.one_hot(mode, p_mu.shape[1])[..., None]
            mu = jnp.sum(p_mu * oh, axis=1)
            logvar = jnp.sum(p_logvar * oh, axis=1)
            z = reparameterize(k_normal, mu, logvar)
        else:
            z = jax.random.normal(key, (batch_size, self.latent_dim))
        return self.decode(z, cond)
