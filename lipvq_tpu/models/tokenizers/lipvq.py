"""LipVQ-VAE — the paper's action tokenizer, TPU-native.

Semantics match the reference ``LLFQVAE_V4``
(reference: robomimic/models/vq_vae/backbone_lfqvae_v5.py:51-84):

- encoder: Linear(feature,64) -> GELU -> Linear(64,hidden) -> GELU
- to_latent: Lipschitz-constrained linear (L-inf row norm scaled by
  softplus(ci), sigmoid output) — backbone_lfqvae_v5.py:6-24
- quantizer: plain L2 nearest-neighbor codebook lookup (the reference's
  "sign mask" is a mathematical no-op — SURVEY.md §2.3.1); **no
  straight-through estimator** (§2.3.2): z_q = codebook[ids], so gradients
  reach the codebook through recon + codebook loss and the encoder only
  through the commitment loss
- decoder: Linear(latent,64) -> GELU -> Linear(64,hidden) -> GELU,
  then to_output Linear(hidden,feature)
- loss = recon + 0.25*commit + 0.25*codebook (backbone_lfqvae_v5.py:79-83)
- the returned latent is stop-gradient'ed (§2.3.3) — the policy loss never
  trains the tokenizer; it trains via its own AdamW(1e-3, wd 1e-4)

The codebook lookup runs through the fused Pallas kernel on TPU
(lipvq_tpu/ops/vq_lookup.py) and the XLA reference path elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import TorchLinear, gelu_exact
from lipvq_tpu.ops.vq_lookup import vq_nearest


def lipschitz_normalize(w_row_major: jax.Array, ci: jax.Array) -> jax.Array:
    """L-inf row normalization with learnable per-row bound softplus(ci).

    ``w_row_major`` is [out, in] (torch layout); each row is scaled by
    min(1, softplus(ci)/sum|row|) — reference backbone_lfqvae_v5.py:6-12.
    """
    absrowsum = jnp.sum(jnp.abs(w_row_major), axis=1, keepdims=True)
    scale = jnp.minimum(1.0, jax.nn.softplus(ci)[:, None] / absrowsum)
    return w_row_major * scale


class LipschitzDense(nn.Module):
    """Lipschitz-normalized linear with sigmoid output
    (reference LipschitzMLP, backbone_lfqvae_v5.py:15-24).

    Parameters use torch layout/init: W [out, in] ~ N(0,1), b zeros,
    ci ones.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param(
            "W", jax.nn.initializers.normal(stddev=1.0), (self.features, in_dim),
            jnp.float32,
        )
        b = self.param("b", jax.nn.initializers.zeros, (self.features,), jnp.float32)
        ci = self.param("ci", jax.nn.initializers.ones, (self.features,), jnp.float32)
        w_norm = lipschitz_normalize(w, ci)
        return jax.nn.sigmoid(
            jnp.dot(x, w_norm.T, preferred_element_type=jnp.float32) + b
        )


def kaiming_uniform_init(key, shape, dtype=jnp.float32):
    """torch nn.init.kaiming_uniform_ defaults: bound = sqrt(6/fan_in)
    with fan_in = shape[1] (reference codebook init, backbone_lfqvae_v5.py:35)."""
    fan_in = shape[1]
    bound = jnp.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class LFQQuantizer(nn.Module):
    """Learnable-codebook L2 nearest-neighbor quantizer
    (reference backbone_lfqvae_v5.py:27-48, minus the no-op sign mask)."""

    num_codes: int
    code_dim: int
    use_pallas: bool | None = None

    def setup(self):
        self.codebook = self.param(
            "codebook", kaiming_uniform_init, (self.num_codes, self.code_dim),
            jnp.float32,
        )

    def __call__(self, z_e):
        ids = vq_nearest(z_e, self.codebook, use_pallas=self.use_pallas)
        ids = jax.lax.stop_gradient(ids)
        z_q = jnp.take(self.codebook, ids, axis=0)  # differentiable wrt codebook
        return z_q, ids

    def embed(self, ids):
        return jnp.take(self.codebook, ids, axis=0)


class LipVQVAE(nn.Module):
    """The paper's LipVQ-VAE tokenizer (reference LLFQVAE_V4).

    ``ema_codebook`` enables the EMA codebook-update extension
    (BASELINE.json config sweep: "EMA vs loss-based codebook updates"):
    cluster statistics from the fused Pallas stats kernel update the
    codebook as an exponential moving average (VQ-VAE v2 style) instead
    of through the codebook loss; across a device mesh the (counts, sums)
    stats are psum-merged by the train step (SURVEY.md §5.8).
    """

    feature_dim: int
    latent_dim: int
    num_codes: int = 1024
    hidden_dim: int = 128
    use_pallas: bool | None = None
    ema_codebook: bool = False
    ema_decay: float = 0.99
    ema_eps: float = 1e-5

    def setup(self):
        self.enc1 = TorchLinear(64)
        self.enc2 = TorchLinear(self.hidden_dim)
        self.to_latent = LipschitzDense(self.latent_dim)
        self.quantizer = LFQQuantizer(
            self.num_codes, self.latent_dim, use_pallas=self.use_pallas
        )
        self.dec1 = TorchLinear(64)
        self.dec2 = TorchLinear(self.hidden_dim)
        self.to_output = TorchLinear(self.feature_dim)
        if self.ema_codebook:
            self.ema_cluster_size = self.variable(
                "vq_stats", "ema_cluster_size",
                lambda: jnp.zeros((self.num_codes,), jnp.float32),
            )
            self.ema_embed_sum = self.variable(
                "vq_stats", "ema_embed_sum",
                lambda: jnp.zeros((self.num_codes, self.latent_dim), jnp.float32),
            )

    def encode(self, x):
        h = gelu_exact(self.enc1(x))
        h = gelu_exact(self.enc2(h))
        return self.to_latent(h)

    def decode(self, z_q):
        h = gelu_exact(self.dec1(z_q))
        h = gelu_exact(self.dec2(h))
        return self.to_output(h)

    def __call__(self, x):
        """x [B, feature_dim] -> (z_latent [B, latent_dim], loss, ids [B]).

        z_latent is stop-gradient'ed: the consumer (the ICL policy) never
        backprops into the tokenizer (SURVEY.md §2.3.3).
        """
        z_e = self.encode(x)
        z_q, ids = self.quantizer(z_e)
        z_latent = jax.lax.stop_gradient(z_q)
        x_recon = self.decode(z_q)

        recon_loss = jnp.mean((x_recon - x) ** 2)
        commitment_loss = jnp.mean((jax.lax.stop_gradient(z_q) - z_e) ** 2)
        if self.ema_codebook:
            # codebook trains via EMA stats, not the codebook loss; stats
            # update only when the collection is mutable (training)
            loss = recon_loss + 0.25 * commitment_loss
            if not self.is_initializing() and self.is_mutable_collection(
                "vq_stats"
            ):
                self._ema_update(z_e, ids)
        else:
            codebook_loss = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
            loss = recon_loss + 0.25 * commitment_loss + 0.25 * codebook_loss
        return z_latent, loss, ids

    def _ema_update(self, z_e, ids):
        """EMA cluster-stat accumulation (applied to the codebook by
        ``apply_ema_codebook`` outside the gradient path). Uses the XLA
        segment-sum stats; the fused Pallas stats kernel feeds the same
        quantities on the offline corpus path."""
        from lipvq_tpu.ops.vq_lookup import vq_cluster_stats

        counts, sums = vq_cluster_stats(
            jax.lax.stop_gradient(z_e), ids, self.num_codes
        )
        d = self.ema_decay
        self.ema_cluster_size.value = (
            d * self.ema_cluster_size.value + (1 - d) * counts
        )
        self.ema_embed_sum.value = d * self.ema_embed_sum.value + (1 - d) * sums

    def tokenize(self, x):
        """Encode + quantize only: x -> token ids (offline corpus path)."""
        z_e = self.encode(x)
        _, ids = self.quantizer(z_e)
        return ids

    def detokenize(self, ids):
        """ids -> reconstructed actions via codebook + decoder."""
        z_q = self.quantizer.embed(ids)
        return self.decode(z_q)


def apply_ema_codebook(codebook, ema_cluster_size, ema_embed_sum,
                       eps: float = 1e-5):
    """New codebook from EMA stats (VQ-VAE-2 style Laplace smoothing).

    Under pjit with a data-sharded batch the stats are already globally
    reduced by GSPMD (the one-hot matmul contracts the sharded axis), so
    no explicit psum is needed here.
    """
    import jax.numpy as jnp

    num_codes = codebook.shape[0]
    n = jnp.sum(ema_cluster_size)
    smoothed = (ema_cluster_size + eps) / (n + num_codes * eps) * n
    new_codebook = ema_embed_sum / smoothed[:, None]
    # keep untouched (never-assigned) codes at their current values
    touched = (ema_cluster_size > 0)[:, None]
    return jnp.where(touched, new_codebook, codebook)
