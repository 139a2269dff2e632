"""Mamba selective-state-space block — TPU-native selective scan.

The reference uses the `mamba_ssm` package's CUDA selective-scan kernel
(reference: robomimic/models/obs_nets.py:1229, 2748-2753 — note the import
is commented out at obs_nets.py:23; SURVEY.md §2.3.7 treats mamba_ssm as an
optional dependency). This is the TPU replacement called out in SURVEY.md
§2.4: the recurrence

    h_t = exp(dt_t * A) h_{t-1} + dt_t * B_t * x_t
    y_t = C_t . h_t + D * x_t

is evaluated with ``jax.lax.associative_scan`` over the time axis (the
(a, b) -> (a2*a1, a2*b1 + b2) monoid), fp32 state, matching the CUDA
kernel's ZOH discretization (dA = exp(dt*A), dB = dt*B — the simplified
discretization mamba_ssm uses for B).

Architecture follows Gu & Dao 2023 (arXiv:2312.00752) with mamba_ssm's
defaults: d_inner = expand*d_model, dt_rank = ceil(d_model/16), depthwise
causal conv1d (width d_conv) + SiLU, data-dependent (dt, B, C), SiLU-gated
output projection.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import TORCH_LINEAR_KERNEL_INIT


def selective_scan(x, dt, A, B, C, D):
    """Associative-scan selective SSM.

    x:  [b, t, d]    input sequence
    dt: [b, t, d]    softplus-activated step sizes
    A:  [d, n]       state matrix (negative real)
    B:  [b, t, n]    input->state projection (data dependent)
    C:  [b, t, n]    state->output projection (data dependent)
    D:  [d]          skip connection
    returns y [b, t, d]
    """
    dtype = jnp.float32
    x32, dt32 = x.astype(dtype), dt.astype(dtype)
    dA = jnp.exp(dt32[..., None] * A[None, None])          # [b, t, d, n]
    dBx = (dt32 * x32)[..., None] * B[:, :, None, :]        # [b, t, d, n]

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    _, h = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
    y = jnp.einsum("btdn,btn->btd", h, C.astype(dtype),
                   preferred_element_type=jnp.float32)
    return (y + x32 * D[None, None]).astype(x.dtype)


class MambaBlock(nn.Module):
    """One Mamba block: in_proj -> causal depthwise conv -> SSM -> gate."""

    d_model: int
    d_state: int = 8
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, x):
        """x [b, t, d_model] -> [b, t, d_model]."""
        b, t, d = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)

        xz = nn.Dense(2 * d_inner, use_bias=False,
                      kernel_init=TORCH_LINEAR_KERNEL_INIT, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)

        # depthwise causal conv over time: pad left d_conv-1
        conv_kernel = self.param(
            "conv_kernel", TORCH_LINEAR_KERNEL_INIT, (self.d_conv, d_inner),
            jnp.float32,
        )
        conv_bias = self.param(
            "conv_bias", jax.nn.initializers.zeros, (d_inner,), jnp.float32
        )
        xp = jnp.pad(xs, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        # sum_k kernel[k] * x[t - (d_conv-1) + k] — a tiny unrolled stencil,
        # XLA fuses it; avoids conv_general_dilated overhead at d_conv=4
        xs = sum(
            conv_kernel[k][None, None, :] * xp[:, k : k + t, :]
            for k in range(self.d_conv)
        ) + conv_bias[None, None, :]
        xs = jax.nn.silu(xs)

        x_dbc = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False,
                         kernel_init=TORCH_LINEAR_KERNEL_INIT, name="x_proj")(xs)
        dt, B, C = jnp.split(x_dbc, [dt_rank, dt_rank + self.d_state], axis=-1)
        # dt_proj with mamba_ssm's bias init: softplus^-1 of dt in
        # [dt_min=1e-3, dt_max=0.1] log-uniform
        def dt_bias_init(key, shape, dtype=jnp.float32):
            u = jax.random.uniform(key, shape, dtype)
            dt0 = jnp.exp(u * (jnp.log(0.1) - jnp.log(1e-3)) + jnp.log(1e-3))
            dt0 = jnp.maximum(dt0, 1e-4)
            return dt0 + jnp.log(-jnp.expm1(-dt0))  # inverse softplus

        dt = nn.Dense(d_inner, kernel_init=TORCH_LINEAR_KERNEL_INIT,
                      bias_init=dt_bias_init, name="dt_proj")(dt)
        dt = jax.nn.softplus(dt)

        # A = -exp(A_log), A_log init: log(1..d_state) per channel
        A_log = self.param(
            "A_log",
            lambda key, shape: jnp.tile(
                jnp.log(jnp.arange(1, self.d_state + 1, dtype=jnp.float32))[None],
                (shape[0], 1),
            ),
            (d_inner, self.d_state),
        )
        A = -jnp.exp(A_log)
        D = self.param("D", jax.nn.initializers.ones, (d_inner,), jnp.float32)

        y = selective_scan(xs, dt, A, B, C, D)
        y = y * jax.nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False,
                        kernel_init=TORCH_LINEAR_KERNEL_INIT, name="out_proj")(y)


class MambaBackbone(nn.Module):
    """Stack of residual Mamba blocks with pre-LN + final LN — the ICL
    sequence backbone used in place of GPT by ICLMIMOMamba
    (reference obs_nets.py:2748-2753 wraps a single Mamba over the token
    stream; a stack with num_layers mirrors the transformer config)."""

    d_model: int
    num_layers: int = 1
    d_state: int = 8
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            h = nn.LayerNorm(name=f"ln_{i}")(x)
            x = x + MambaBlock(
                d_model=self.d_model, d_state=self.d_state,
                d_conv=self.d_conv, expand=self.expand, name=f"mamba_{i}",
            )(h)
        return nn.LayerNorm(name="out_ln")(x)
