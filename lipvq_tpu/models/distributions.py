"""Action distributions in JAX.

GMM machinery matching torch's
Independent(Normal) -> MixtureSameFamily composition used by the reference
GMM heads (reference: robomimic/models/policy_nets.py:2562-2581), plus the
TanhWrappedDistribution (reference: robomimic/models/distributions.py).

Implemented as pytree-friendly NamedTuple parameter bundles with pure
log_prob/sample/mean functions — idiomatic for jitted train steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GMMParams(NamedTuple):
    """Diagonal-Gaussian mixture over actions.

    means:  [..., M, A]
    scales: [..., M, A]
    logits: [..., M]
    (leading dims are batch/time; M mixture modes; A action dim)
    """

    means: jax.Array
    scales: jax.Array
    logits: jax.Array


def gmm_log_prob(p: GMMParams, x: jax.Array) -> jax.Array:
    """log prob of x [..., A] under the mixture -> [...]."""
    x = x[..., None, :]  # broadcast over modes
    comp = -0.5 * (
        ((x - p.means) / p.scales) ** 2
        + 2.0 * jnp.log(p.scales)
        + jnp.log(2.0 * jnp.pi)
    )
    comp_lp = jnp.sum(comp, axis=-1)  # [..., M] Independent over action dim
    mix_lp = jax.nn.log_softmax(p.logits, axis=-1)
    return jax.nn.logsumexp(comp_lp + mix_lp, axis=-1)


def gmm_sample(p: GMMParams, key: jax.Array) -> jax.Array:
    """Ancestral sample: categorical mode, then diagonal Gaussian."""
    k_mode, k_normal = jax.random.split(key)
    mode = jax.random.categorical(k_mode, p.logits, axis=-1)  # [...]
    mode_oh = jax.nn.one_hot(mode, p.logits.shape[-1], dtype=p.means.dtype)
    mean = jnp.sum(p.means * mode_oh[..., None], axis=-2)
    scale = jnp.sum(p.scales * mode_oh[..., None], axis=-2)
    eps = jax.random.normal(k_normal, mean.shape, dtype=mean.dtype)
    return mean + scale * eps


def gmm_mean(p: GMMParams) -> jax.Array:
    """Mixture mean (probability-weighted component means)."""
    w = jax.nn.softmax(p.logits, axis=-1)[..., None]
    return jnp.sum(w * p.means, axis=-2)


def make_gmm(
    raw_means: jax.Array,
    raw_scales: jax.Array,
    logits: jax.Array,
    *,
    min_std: float = 1e-4,
    std_activation: str = "softplus",
    use_tanh_mean: bool = True,
    low_noise: bool = False,
) -> GMMParams:
    """Assemble GMM params the way the reference GMM heads do
    (policy_nets.py:2549-2560): tanh-squash means (unless a tanh-wrapped
    dist is used), then either fixed sigma=1e-4 at low-noise eval or
    activation(raw_scales) + min_std."""
    means = jnp.tanh(raw_means) if use_tanh_mean else raw_means
    if low_noise:
        scales = jnp.full_like(means, 1e-4)
    else:
        if std_activation == "softplus":
            scales = jax.nn.softplus(raw_scales) + min_std
        elif std_activation == "exp":
            scales = jnp.exp(raw_scales) + min_std
        else:
            raise ValueError(std_activation)
    return GMMParams(means=means, scales=scales, logits=logits)


# ---------------------------------------------------------------------------
# Tanh-wrapped distribution (reference models/distributions.py)
# ---------------------------------------------------------------------------

class TanhWrapped(NamedTuple):
    base: GMMParams
    scale: float = 1.0


def tanh_log_prob(d: TanhWrapped, value: jax.Array, eps: float = 1e-6) -> jax.Array:
    """log prob with tanh change-of-variables (one_minus_sq correction)."""
    inner = jnp.clip(value / d.scale, -1.0 + eps, 1.0 - eps)
    pre_tanh = jnp.arctanh(inner)
    lp = gmm_log_prob(d.base, pre_tanh)
    correction = jnp.sum(
        jnp.log(d.scale * (1.0 - inner**2) + eps), axis=-1
    )
    return lp - correction


def tanh_sample(d: TanhWrapped, key: jax.Array) -> jax.Array:
    z = gmm_sample(d.base, key)
    return jnp.tanh(z) * d.scale
