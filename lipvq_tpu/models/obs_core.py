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


class _Bottleneck(nn.Module):
    """ResNet bottleneck block (1x1 -> 3x3 -> 1x1, 4x expansion)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_feats = 4 * self.features
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(out_feats, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn3")(y)
        if residual.shape[-1] != out_feats or self.stride != 1:
            residual = nn.Conv(out_feats, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    name="downsample_bn")(residual)
        return jax.nn.relu(y + residual)


class ResNetConv(nn.Module):
    """Generic ResNet trunk without avgpool/fc: [B, H, W, 3] ->
    [B, H/32, W/32, C_out]. depth 18/34 use basic blocks (C_out 512);
    depth 50 uses bottlenecks (C_out 2048). Covers the reference's
    ResNet{18,34,50}Conv(+FiLM) family (base_nets.py:550-1090)."""

    depth: int = 18

    @nn.compact
    def __call__(self, x, train: bool = False, film_cond=None):
        blocks_per_stage = {
            18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)
        }[self.depth]
        bottleneck = self.depth >= 50
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="stem_bn")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stage_feats = (64, 128, 256, 512)
        for si, (feats, n_blocks) in enumerate(
            zip(stage_feats, blocks_per_stage)
        ):
            stride = 1 if si == 0 else 2
            block_cls = _Bottleneck if bottleneck else _BasicBlock
            for bi in range(n_blocks):
                x = block_cls(feats, stride if bi == 0 else 1,
                              name=f"layer{si + 1}_{bi}")(x, train=train)
            if film_cond is not None:
                # FiLM after each stage (reference ResNet18ConvFiLM,
                # base_nets.py:652-746)
                x = FiLMLayer(x.shape[-1], name=f"film{si + 1}")(x, film_cond)
        return x


class ResNet18Conv(ResNetConv):
    depth: int = 18


class ResNet34Conv(ResNetConv):
    depth: int = 34


class ResNet50Conv(ResNetConv):
    depth: int = 50


class ShallowConv(nn.Module):
    """Simple 4-conv encoder (reference base_nets.py:1376)."""

    @nn.compact
    def __call__(self, x, train: bool = False, film_cond=None):
        for i, (feats, stride) in enumerate(
            [(32, 2), (64, 2), (128, 2), (256, 2)]
        ):
            x = nn.Conv(feats, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), name=f"conv{i}")(x)
            x = jax.nn.relu(x)
        return x


class Conv1dBase(nn.Module):
    """Stack of 1-D convs over [B, L, C] (reference base_nets.py:1414 —
    used by ScanCore for range scans)."""

    channels: tuple = (32, 64, 64)
    kernel_sizes: tuple = (8, 4, 2)
    strides: tuple = (4, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 2:
            x = x[..., None]
        for i, (c, k, s) in enumerate(
            zip(self.channels, self.kernel_sizes, self.strides)
        ):
            x = nn.Conv(c, (k,), strides=(s,), name=f"conv{i}")(x)
            x = jax.nn.relu(x)
        return x.reshape(x.shape[0], -1)


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

class ColorRandomizer(nn.Module):
    """Brightness/contrast/saturation jitter at train time
    (reference obs_core.py:705 — torchvision ColorJitter equivalent,
    implemented with elementwise ops XLA fuses)."""

    brightness: float = 0.3
    contrast: float = 0.3
    saturation: float = 0.3

    def __call__(self, x, train: bool = False, rng=None):
        if not train or rng is None:
            return x
        b = x.shape[0]
        k1, k2, k3 = jax.random.split(rng, 3)
        br = 1.0 + jax.random.uniform(
            k1, (b, 1, 1, 1), minval=-self.brightness, maxval=self.brightness
        )
        ct = 1.0 + jax.random.uniform(
            k2, (b, 1, 1, 1), minval=-self.contrast, maxval=self.contrast
        )
        st = 1.0 + jax.random.uniform(
            k3, (b, 1, 1, 1), minval=-self.saturation, maxval=self.saturation
        )
        x = x * br
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        x = (x - mean) * ct + mean
        gray = jnp.mean(x, axis=-1, keepdims=True)
        x = gray + (x - gray) * st
        return jnp.clip(x, 0.0, 1.0)


class GaussianNoiseRandomizer(nn.Module):
    """Additive gaussian pixel noise at train time
    (reference obs_core.py:863)."""

    noise_mean: float = 0.0
    noise_std: float = 0.3
    limits: tuple | None = (0.0, 1.0)

    def __call__(self, x, train: bool = False, rng=None):
        if not train or rng is None:
            return x
        x = x + self.noise_mean + self.noise_std * jax.random.normal(
            rng, x.shape
        )
        if self.limits is not None:
            x = jnp.clip(x, *self.limits)
        return x


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

class CrossAttentionConditioner(nn.Module):
    """Cross-attention language conditioning over the feature map
    (reference ResNet18ConvCrossAttention, base_nets.py:944-1021:
    flattened 512-d patches query a single 768-d lang_emb token through
    8-head attention; kdim/vdim projection is what flax's
    MultiHeadDotProductAttention does for mismatched kv dims)."""

    num_heads: int = 8

    @nn.compact
    def __call__(self, feat_map, lang_emb):
        B, H, W, C = feat_map.shape
        x = feat_map.reshape(B, H * W, C)
        kv = lang_emb[:, None, :]
        x = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=C, out_features=C,
            name="cross_attention",
        )(x, kv)
        return x.reshape(B, H, W, C)


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
    color_jitter: bool = False
    gaussian_noise: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, lang_emb=None):
        if self.color_jitter:
            rng = self.make_rng("dropout") if train else None
            x = ColorRandomizer(name="color")(x, train=train, rng=rng)
        if self.gaussian_noise:
            rng = self.make_rng("dropout") if train else None
            x = GaussianNoiseRandomizer(name="noise")(x, train=train, rng=rng)
        if self.crop_height and self.crop_width:
            rand = CropRandomizer(self.crop_height, self.crop_width,
                                  self.num_crops, name="crop")
            rng = self.make_rng("dropout") if train else None
            x = rand.forward_in(x, train=train, rng=rng)
        film_cond = lang_emb if self.film else None
        backbone_cls = {
            "ResNet18Conv": ResNet18Conv,
            "ResNet18ConvFiLM": ResNet18Conv,
            "ResNet34Conv": ResNet34Conv,
            "ResNet34ConvFiLM": ResNet34Conv,
            "ResNet50Conv": ResNet50Conv,
            "ResNet50ConvFiLM": ResNet50Conv,
            "ResNet18ConvCrossAttention": ResNet18Conv,
            "ShallowConv": ShallowConv,
        }.get(self.backbone, ResNet18Conv)
        h = backbone_cls(name="backbone")(x, train=train, film_cond=film_cond)
        if self.backbone.endswith("CrossAttention") and lang_emb is not None:
            h = CrossAttentionConditioner(name="xattn")(h, lang_emb)
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


class PretrainedReprConv(nn.Module):
    """Frozen pretrained visual representation backbone (the reference's
    R3MConv / MVPConv wrappers, base_nets.py:1091/1187, load torchvision
    checkpoints from the r3m/mvp packages).

    ``load_pretrained(path)`` returns the (params, batch_stats) override
    for this module from a converted checkpoint — produce one with
    ``python -m lipvq_tpu.scripts.import_torch_ckpt --component resnet18``
    (torchvision/R3M/MVP state_dicts). Without a checkpoint the trunk is
    randomly initialized.
    """

    ckpt_path: str | None = None
    freeze: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, film_cond=None):
        h = ResNet18Conv(name="backbone")(x, train=train and not self.freeze)
        if self.freeze:
            h = jax.lax.stop_gradient(h)
        return h

    @staticmethod
    def load_pretrained(path: str):
        """Converted-ckpt msgpack -> {'params': {'backbone': ...},
        'batch_stats': {'backbone': ...}} override trees."""
        from flax import serialization

        with open(path, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        return (
            {"backbone": restored["params"]},
            {"backbone": restored.get("batch_stats", {})},
        )


class R3MConv(PretrainedReprConv):
    pass


class MVPConv(PretrainedReprConv):
    pass


class ScanCore(nn.Module):
    """Range-scan encoder: Conv1dBase + projection
    (reference obs_core.py:317)."""

    feature_dimension: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False, lang_emb=None):
        h = Conv1dBase(name="conv1d")(x, train=train)
        return jax.nn.relu(
            TorchLinear(self.feature_dimension, name="proj")(h)
        )


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
    if core_name == "ScanCore":
        kwargs.pop("num_kp", None)
        kwargs.pop("crop_height", None)
        kwargs.pop("crop_width", None)
        kwargs.pop("num_crops", None)
        return ScanCore(name=name, **kwargs)
    raise KeyError(f"Unknown encoder core {core_name!r}")
