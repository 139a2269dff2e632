"""Visual encoder cores + randomizers (flax, NHWC).

Counterpart of reference obs_core.py / base_nets.py visual stack:
- ``ResNet18Conv``      (reference base_nets.py:550) — conv backbone,
  classifier head cut, output [B, H/32, W/32, 512]
- ``ResNet18ConvFiLM``  (reference base_nets.py:652) — FiLM conditioning on
  a language embedding after every residual block
- ``SpatialSoftmax``    (reference base_nets.py:1510) — per-channel spatial
  expectation keypoints
- ``VisualCore``        (reference obs_core.py:61) — backbone + pool +
  flatten + linear projection to feature_dimension
- ``VisualCoreLanguageConditioned`` (reference obs_core.py:186) — FiLM
  backbone fed by a ``lang_emb`` key
- ``CropRandomizer``    (reference obs_core.py:565) — random crops at train
  (N crops folded into batch), center crop at eval, mean-pool unfold

TPU-native: everything is NHWC (XLA TPU conv layout); images arrive
float32 in [0, 1] from the data pipeline (utils/obs_utils.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import FiLMLayer, TorchLinear

# ---------------------------------------------------------------------------
# ResNet-18 (flax, NHWC)
# ---------------------------------------------------------------------------

class _BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    name="downsample_bn")(residual)
        return jax.nn.relu(y + residual)


class ResNet18Conv(nn.Module):
    """ResNet-18 trunk without avgpool/fc: [B, H, W, 3] -> [B, H/32, W/32, 512]."""

    @nn.compact
    def __call__(self, x, train: bool = False, film_cond=None):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="stem_bn")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stages = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for si, (feats, stride) in enumerate(stages):
            for bi in range(2):
                x = _BasicBlock(feats, stride if bi == 0 else 1,
                                name=f"layer{si + 1}_{bi}")(x, train=train)
            if film_cond is not None:
                # FiLM after each stage (reference ResNet18ConvFiLM applies a
                # FiLMLayer per residual stage, base_nets.py:652-746)
                x = FiLMLayer(feats, name=f"film{si + 1}")(x, film_cond)
        return x


class SpatialSoftmax(nn.Module):
    """Spatial-softmax keypoints (reference base_nets.py:1510): per channel,
    softmax over H*W then expected (x, y) -> [B, num_kp*2]."""

    num_kp: int = 32
    temperature: float = 1.0
    learnable_temperature: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        if self.num_kp != c:
            x = nn.Conv(self.num_kp, (1, 1), name="kp_conv")(x)
            c = self.num_kp
        if self.learnable_temperature:
            log_t = self.param("log_temperature",
                               lambda k, s: jnp.log(jnp.full(s, self.temperature)),
                               (1,))
            temperature = jnp.exp(log_t)
        else:
            temperature = self.temperature
        pos_x = jnp.linspace(-1.0, 1.0, w)
        pos_y = jnp.linspace(-1.0, 1.0, h)
        feats = x.transpose(0, 3, 1, 2).reshape(b, c, h * w)
        attention = jax.nn.softmax(feats / temperature, axis=-1)
        grid_x = jnp.tile(pos_x[None, :], (h, 1)).reshape(h * w)
        grid_y = jnp.tile(pos_y[:, None], (1, w)).reshape(h * w)
        ex = jnp.sum(attention * grid_x[None, None], axis=-1)
        ey = jnp.sum(attention * grid_y[None, None], axis=-1)
        return jnp.stack([ex, ey], axis=-1).reshape(b, c * 2)


class SpatialMeanPool(nn.Module):
    """Mean over spatial dims (reference base_nets.py:1658)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Randomizers (reference obs_core.py:565-950)
# ---------------------------------------------------------------------------

class CropRandomizer(nn.Module):
    """Random crop at train (n_crops folded into batch), center crop at
    eval; outputs mean-pooled over crops by the caller protocol
    (reference obs_core.py:639-674)."""

    crop_height: int
    crop_width: int
    num_crops: int = 1

    def forward_in(self, x, train: bool, rng=None):
        b, h, w, c = x.shape
        ch, cw = self.crop_height, self.crop_width
        if train and rng is not None:
            n = self.num_crops
            ys = jax.random.randint(rng, (b * n,), 0, h - ch + 1)
            xs = jax.random.randint(jax.random.fold_in(rng, 1), (b * n,), 0,
                                    w - cw + 1)
            imgs = jnp.repeat(x, n, axis=0)

            def crop(img, y0, x0):
                return jax.lax.dynamic_slice(img, (y0, x0, 0), (ch, cw, c))

            return jax.vmap(crop)(imgs, ys, xs)
        y0 = (h - ch) // 2
        x0 = (w - cw) // 2
        return x[:, y0 : y0 + ch, x0 : x0 + cw, :]

    def forward_out(self, feats, train: bool):
        if train:
            n = self.num_crops
            return feats.reshape(-1, n, feats.shape[-1]).mean(axis=1)
        return feats

    def __call__(self, x, train: bool = False):
        return self.forward_in(x, train)


# ---------------------------------------------------------------------------
# Visual cores
# ---------------------------------------------------------------------------

class VisualCore(nn.Module):
    """backbone -> pool -> flatten -> linear proj (reference obs_core.py:61).

    ``crop`` folds a CropRandomizer around the backbone when configured
    (robocasa config: 116x116, 1 crop — config_gen_utils.py:141-149).
    """

    feature_dimension: int = 64
    backbone: str = "ResNet18Conv"
    pool: str = "SpatialSoftmax"
    num_kp: int = 32
    crop_height: int = 0
    crop_width: int = 0
    num_crops: int = 1
    film: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, lang_emb=None):
        if self.crop_height and self.crop_width:
            rand = CropRandomizer(self.crop_height, self.crop_width,
                                  self.num_crops, name="crop")
            rng = self.make_rng("dropout") if train else None
            x = rand.forward_in(x, train=train, rng=rng)
        film_cond = lang_emb if self.film else None
        h = ResNet18Conv(name="backbone")(x, train=train, film_cond=film_cond)
        if self.pool == "SpatialSoftmax":
            f = SpatialSoftmax(num_kp=self.num_kp, name="pool")(h, train=train)
        else:
            f = SpatialMeanPool(name="pool")(h, train=train)
        f = TorchLinear(self.feature_dimension, name="proj")(f)
        f = jax.nn.relu(f)
        if self.crop_height and self.crop_width and train:
            rand = CropRandomizer(self.crop_height, self.crop_width,
                                  self.num_crops)
            f = rand.forward_out(f, train=train)
        return f


def build_core(core_name: str, key: str, shape, name: str):
    """Factory used by ObservationEncoder. core_name may carry kwargs via
    'VisualCore:feature_dimension=64,num_kp=32' style suffix."""
    kwargs = {}
    if ":" in core_name:
        core_name, arg_str = core_name.split(":", 1)
        for pair in arg_str.split(","):
            k, v = pair.split("=")
            kwargs[k] = int(v) if v.isdigit() else v
    if core_name == "VisualCore":
        return VisualCore(name=name, **kwargs)
    if core_name == "VisualCoreLanguageConditioned":
        return VisualCore(name=name, film=True, **kwargs)
    raise KeyError(f"Unknown encoder core {core_name!r}")
