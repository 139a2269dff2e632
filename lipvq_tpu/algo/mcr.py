"""MCR — pretrained-representation conditioned BC.

Counterpart of reference algo/mcr_main.py + algo/mcr/ subpackage
(~2,100 LoC): (a) a representation pretrainer over demonstration frames
(the reference vendors the MCR repo's ego4d trainer, whose objective
combines time-contrastive InfoNCE with behavior-cloning alignment), and
(b) ``MCR_Transformer_GMM`` — a transformer GMM BC policy whose visual
encoder is initialized from (and optionally frozen to) the pretrained
representation.

TPU-native notes: the reference's ``torch.nn.DataParallel`` pretraining
(mcr/train_representation.py:32) becomes a single jitted step that
data-parallelizes over the mesh via sharded batches (SURVEY.md §2.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from lipvq_tpu.algo.base import register_algo_factory_func
from lipvq_tpu.algo.bc import BCTransformerGMM
from lipvq_tpu.models.base_nets import TorchLinear
from lipvq_tpu.models.obs_core import ResNet18Conv, SpatialMeanPool


@register_algo_factory_func("mcr")
def algo_config_to_class(algo_config):
    return MCRTransformerGMM, {}


class MCREncoder(nn.Module):
    """ResNet18 trunk + mean pool + projection (the representation)."""

    embed_dim: int = 128

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        h = ResNet18Conv(name="backbone")(imgs, train=train)
        f = SpatialMeanPool(name="pool")(h, train=train)
        return TorchLinear(self.embed_dim, name="proj")(f)


class MCRPretrainer:
    """Time-contrastive + BC-alignment representation pretraining.

    Batch contract: frames [B, 3, H, W, C] (anchor, positive=temporally
    close, negative=far frame from the same or another demo) and the
    anchor's action [B, A]. Loss = InfoNCE(anchor, positive vs in-batch
    negatives) + bc_weight * MSE(action_head(anchor_emb), action).
    """

    def __init__(self, embed_dim: int = 128, action_dim: int = 12,
                 lr: float = 1e-4, temperature: float = 0.1,
                 bc_weight: float = 1.0, seed: int = 0):
        self.encoder = MCREncoder(embed_dim=embed_dim)
        self.temperature = temperature
        self.bc_weight = bc_weight
        self.action_dim = action_dim

        class _Head(nn.Module):
            @nn.compact
            def __call__(self, z):
                h = jax.nn.relu(TorchLinear(256, name="h1")(z))
                return TorchLinear(action_dim, name="out")(h)

        self.head = _Head()
        key = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((2, 64, 64, 3), jnp.float32)
        enc_vars = self.encoder.init(key, dummy)
        self.params = {
            "encoder": enc_vars["params"],
            "head": self.head.init(
                jax.random.fold_in(key, 1), jnp.zeros((2, embed_dim))
            )["params"],
        }
        self.extra_vars = {
            k: v for k, v in enc_vars.items() if k != "params"
        }
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self._jit_step = jax.jit(self._step_impl)

    def _embed(self, params, extra, imgs, train):
        variables = {"params": params["encoder"], **extra}
        if train and extra:
            out, updates = self.encoder.apply(
                variables, imgs, train=True, mutable=list(extra.keys())
            )
            return out, updates
        return self.encoder.apply(variables, imgs, train=False), extra

    def _step_impl(self, params, extra, opt_state, frames, actions):
        def loss_fn(p):
            b = frames.shape[0]
            flat = frames.reshape((b * 3,) + frames.shape[2:])
            z, updates = self._embed(p, extra, flat, train=True)
            z = z.reshape(b, 3, -1)
            z = z / jnp.maximum(
                jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8
            )
            anchor, pos = z[:, 0], z[:, 1]
            # InfoNCE: positives on the diagonal, negatives = other
            # batch positives + the explicit far frames
            cands = jnp.concatenate([pos, z[:, 2]], axis=0)  # [2B, D]
            logits = anchor @ cands.T / self.temperature  # [B, 2B]
            labels = jnp.arange(b)
            nce = -jnp.mean(
                jax.nn.log_softmax(logits, axis=-1)[labels, labels]
            )
            a_pred = self.head.apply({"params": p["head"]}, anchor)
            bc = jnp.mean((a_pred - actions) ** 2)
            return nce + self.bc_weight * bc, (nce, bc, updates)

        (loss, (nce, bc, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        ups, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, ups)
        return params, updates, opt_state, {
            "loss": loss, "nce_loss": nce, "bc_loss": bc
        }

    def train_step(self, frames: np.ndarray, actions: np.ndarray) -> dict:
        self.params, self.extra_vars, self.opt_state, metrics = self._jit_step(
            self.params, self.extra_vars, self.opt_state,
            jnp.asarray(frames), jnp.asarray(actions),
        )
        return {k: float(v) for k, v in metrics.items()}

    def save(self, path: str):
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.to_bytes(
                {"params": self.params, "extra_vars": self.extra_vars}
            ))

    def load(self, path: str):
        from flax import serialization

        with open(path, "rb") as f:
            blob = f.read()
        template = {"params": self.params, "extra_vars": self.extra_vars}
        restored = serialization.from_bytes(template, blob)
        self.params = restored["params"]
        self.extra_vars = restored["extra_vars"]


class MCRTransformerGMM(BCTransformerGMM):
    """Transformer GMM BC with an MCR-pretrained visual encoder
    (reference MCR_Transformer_GMM). When
    ``algo.mcr.pretrained_ckpt`` is set, visual-core backbone params are
    initialized from the MCR encoder after network construction."""

    def _create_networks(self):
        super()._create_networks()
        mcr_cfg = self.algo_config.get("mcr", {})
        ckpt = mcr_cfg.get("pretrained_ckpt", None)
        if ckpt:
            from flax import serialization

            with open(ckpt, "rb") as f:
                blob = f.read()
            restored = serialization.msgpack_restore(blob)
            backbone = restored["params"].get("backbone")
            if backbone is not None:
                self._graft_backbone(backbone)

    def _graft_backbone(self, backbone_params):
        """Copy pretrained trunk params into every visual core."""

        def walk(tree, path=()):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    if k == "backbone":
                        tree[k] = jax.tree.map(jnp.asarray, backbone_params)
                    else:
                        walk(v, path + (k,))

        params = jax.tree.map(lambda x: x, self._params)  # copy
        walk(params)
        self._params = params
