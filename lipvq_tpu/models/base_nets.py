"""Base network building blocks (flax.linen).

TPU-native counterpart of the reference's base model library
(reference: robomimic/models/base_nets.py). Only behavior-relevant pieces
are replicated; torch-specific plumbing (Module.output_shape bookkeeping)
is replaced by shape inference at trace time.

Initializer parity: ``TORCH_LINEAR_KERNEL_INIT``/``torch_linear_bias_init``
reproduce torch.nn.Linear's default U(±1/sqrt(fan_in)) so training dynamics
match the reference at matched seeds-in-distribution.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
TORCH_LINEAR_KERNEL_INIT = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_linear_bias_init(key, shape, dtype, fan_in):
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear default initialization."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", TORCH_LINEAR_KERNEL_INIT, (fan_in, self.features), jnp.float32
        )
        y = jnp.dot(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or x.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s, d: torch_linear_bias_init(k, s, d, fan_in),
                (self.features,),
                jnp.float32,
            )
            y = y + bias
        return y


def gelu_exact(x):
    """torch nn.GELU default is the exact erf formulation."""
    return jax.nn.gelu(x, approximate=False)


_ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "gelu": gelu_exact,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "none": lambda x: x,
}


def get_activation(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    return _ACTIVATIONS[name_or_fn]


class MLP(nn.Module):
    """Plain MLP (reference base_nets.py:240): hidden activations between
    layers, optional output activation."""

    layer_dims: Sequence[int]
    output_dim: int
    activation: str | Callable = "relu"
    output_activation: str | Callable | None = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        for dim in self.layer_dims:
            x = TorchLinear(dim)(x)
            x = act(x)
        x = TorchLinear(self.output_dim)(x)
        if self.output_activation is not None:
            x = get_activation(self.output_activation)(x)
        return x


class SpectralNormLinear(nn.Module):
    """Dense layer with spectral normalization (power iteration).

    TPU-native equivalent of torch.nn.utils.spectral_norm on Linear
    (reference: obs_nets.py:1253-1257, vq_vae/backbone_lfqvae_lipschitz.py:15-19).
    The power-iteration vector is a mutable variable in the
    ``spectral_stats`` collection, updated when the collection is mutable
    (training) and frozen at eval, mirroring torch semantics.
    """

    features: int
    n_power_iterations: int = 1
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", TORCH_LINEAR_KERNEL_INIT, (fan_in, self.features), jnp.float32
        )
        bias = self.param(
            "bias",
            lambda k, s, d: torch_linear_bias_init(k, s, d, fan_in),
            (self.features,),
            jnp.float32,
        )
        # torch parametrizes W [out, in] with u [out], v [in]; our kernel is
        # [in, out] so roles swap.
        u_var = self.variable(
            "spectral_stats",
            "u",
            lambda: jax.random.normal(self.make_rng("params"), (self.features,)),
        )
        u = u_var.value
        w = kernel.T  # [out, in]

        def body(_, u):
            v = w.T @ u
            v = v / (jnp.linalg.norm(v) + self.eps)
            u = w @ v
            u = u / (jnp.linalg.norm(u) + self.eps)
            return u

        u = jax.lax.fori_loop(0, self.n_power_iterations, body, u)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(
            (w.T @ u) / (jnp.linalg.norm(w.T @ u) + self.eps)
        )
        sigma = u @ (w @ v)
        if update_stats and not self.is_initializing():
            u_var.value = u
        w_sn = kernel / sigma
        return jnp.dot(x, w_sn, preferred_element_type=jnp.float32) + bias


class CoordConv2d(nn.Module):
    """Conv2d with normalized (x, y) coordinate channels appended to the
    input (reference base_nets.py:1287 — Liu et al. 2018 CoordConv)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ys = jnp.linspace(-1.0, 1.0, h)[None, :, None, None]
        xs = jnp.linspace(-1.0, 1.0, w)[None, None, :, None]
        coords = jnp.concatenate(
            [jnp.broadcast_to(ys, (b, h, w, 1)),
             jnp.broadcast_to(xs, (b, h, w, 1))], axis=-1
        )
        x = jnp.concatenate([x, coords], axis=-1)
        return nn.Conv(self.features, self.kernel_size, strides=self.strides,
                       padding="SAME", name="conv")(x)


class FeatureAggregator(nn.Module):
    """Aggregate features over an axis (reference base_nets.py:1688 —
    average pooling over e.g. multiple camera streams)."""

    dim: int = 1
    agg_type: str = "avg"

    def __call__(self, x):
        assert self.agg_type == "avg"
        return jnp.mean(x, axis=self.dim)


class FiLMLayer(nn.Module):
    """Feature-wise linear modulation from a conditioning vector
    (reference base_nets.py:612): cond -> (gamma, beta); y = gamma*x + beta
    broadcast over spatial dims."""

    feature_dim: int

    @nn.compact
    def __call__(self, x, cond):
        gb = TorchLinear(2 * self.feature_dim)(cond)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        # x: [B, H, W, C] (NHWC on TPU); cond: [B, Dc]
        gamma = gamma[:, None, None, :]
        beta = beta[:, None, None, :]
        return gamma * x + beta
