"""Conditional UNet-1D for Diffusion Policy (flax, NWC layout).

Counterpart of the reference's diffusion nets
(reference: robomimic/algo/diffusion_policy.py:467-742 — SinusoidalPosEmb,
Conv1dBlock (conv + GroupNorm + Mish), ConditionalResidualBlock1D with
FiLM scale+bias conditioning, Down/Upsample1d, ConditionalUnet1D with
down_dims (256, 512, 1024)). TPU-native: sequences are [B, T, C]
channel-last so XLA lowers the 1-D convs onto the MXU.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import TorchLinear


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalPosEmb(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        emb = jnp.log(10000.0) / (half - 1)
        emb = jnp.exp(jnp.arange(half) * -emb)
        emb = t[:, None].astype(jnp.float32) * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class Conv1dBlock(nn.Module):
    out_channels: int
    kernel_size: int = 3
    n_groups: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, (self.kernel_size,),
            padding=[(self.kernel_size // 2, self.kernel_size // 2)],
            name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=self.n_groups, name="gn")(x)
        return mish(x)


class ConditionalResidualBlock1D(nn.Module):
    out_channels: int
    kernel_size: int = 3
    n_groups: int = 8

    @nn.compact
    def __call__(self, x, cond):
        h = Conv1dBlock(self.out_channels, self.kernel_size, self.n_groups,
                        name="block1")(x)
        # FiLM: cond -> (scale, bias) per channel (reference :520-556)
        film = TorchLinear(2 * self.out_channels, name="cond_encoder")(
            mish(cond)
        )
        scale, bias = jnp.split(film[:, None, :], 2, axis=-1)
        h = h * scale + bias
        h = Conv1dBlock(self.out_channels, self.kernel_size, self.n_groups,
                        name="block2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1,), name="residual_conv")(x)
        return h + x


class Downsample1d(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        # SAME keeps T -> ceil(T/2), the exact inverse of Upsample1d's 2x
        return nn.Conv(self.dim, (3,), strides=(2,), padding="SAME",
                       name="conv")(x)


class Upsample1d(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.dim, (4,), strides=(2,),
                                padding="SAME", name="conv")(x)


class ConditionalUnet1D(nn.Module):
    """epsilon-predictor over action sequences [B, Tp, ac_dim] conditioned
    on (diffusion timestep, global obs features)."""

    input_dim: int
    global_cond_dim: int
    diffusion_step_embed_dim: int = 256
    down_dims: Sequence[int] = (256, 512, 1024)
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, sample, timestep, global_cond):
        """sample [B, T, C]; timestep [B] int; global_cond [B, Dg]."""
        dsed = self.diffusion_step_embed_dim
        t_emb = SinusoidalPosEmb(dsed, name="pos_emb")(timestep)
        t_emb = TorchLinear(dsed * 4, name="t1")(t_emb)
        t_emb = mish(t_emb)
        t_emb = TorchLinear(dsed, name="t2")(t_emb)
        cond = jnp.concatenate([t_emb, global_cond], axis=-1)

        dims = list(self.down_dims)
        x = sample
        skips = []
        for i, dim in enumerate(dims):
            x = ConditionalResidualBlock1D(
                dim, self.kernel_size, self.n_groups, name=f"down{i}_res0"
            )(x, cond)
            x = ConditionalResidualBlock1D(
                dim, self.kernel_size, self.n_groups, name=f"down{i}_res1"
            )(x, cond)
            skips.append(x)
            if i < len(dims) - 1:
                x = Downsample1d(dim, name=f"down{i}_ds")(x)

        x = ConditionalResidualBlock1D(
            dims[-1], self.kernel_size, self.n_groups, name="mid_res0"
        )(x, cond)
        x = ConditionalResidualBlock1D(
            dims[-1], self.kernel_size, self.n_groups, name="mid_res1"
        )(x, cond)

        for i, dim in reversed(list(enumerate(dims[:-1]))):
            x = Upsample1d(dims[i + 1], name=f"up{i}_us")(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = ConditionalResidualBlock1D(
                dim, self.kernel_size, self.n_groups, name=f"up{i}_res0"
            )(x, cond)
            x = ConditionalResidualBlock1D(
                dim, self.kernel_size, self.n_groups, name=f"up{i}_res1"
            )(x, cond)

        x = Conv1dBlock(dims[0], self.kernel_size, self.n_groups,
                        name="final_block")(x)
        return nn.Conv(self.input_dim, (1,), name="final_conv")(x)
