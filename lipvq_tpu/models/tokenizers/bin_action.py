"""Adaptive uniform-bin action tokenizer.

Capability parity with the reference ``AdaptiveBinActionEmbedding``
(reference: robomimic/models/bin_action/backbone.py:5-89):

- running per-dimension min/max over training batches, frozen after
  ``num_step_stop`` forward calls (backbone.py:32-35,74-75);
- uniform bin boundaries per dimension; ``bucketize``-style discretization
  clamped to [0, num_bins-1] (backbone.py:54-67);
- one embedding table per action dimension; concat -> 2-layer GELU MLP.

TPU-native design: the running stats are explicit flax variables in the
``bin_stats`` collection, threaded through the jitted train step and
psum-merged across data shards by the caller (min/max are associative so a
cross-shard ``lax.pmin/pmax`` is exact). The per-dimension Python loop over
embedding tables is replaced by a single [action_dim, num_bins, embed_dim]
table indexed with a vectorized gather (XLA lowers this to one fused
gather instead of action_dim small ones).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from lipvq_tpu.models.base_nets import TorchLinear, gelu_exact


class AdaptiveBinActionEmbedding(nn.Module):
    action_dim: int
    output_dim: int
    num_bins: int = 20
    embedding_dim: int = 64
    num_step_stop: int = 10000

    def setup(self):
        # torch nn.Embedding default init: N(0, 1)
        self.embedding_tables = self.param(
            "embedding_tables",
            jax.nn.initializers.normal(stddev=1.0),
            (self.action_dim, self.num_bins, self.embedding_dim),
            jnp.float32,
        )
        self.out1 = TorchLinear(self.embedding_dim * self.action_dim // 2)
        self.out2 = TorchLinear(self.output_dim)
        self.running_min = self.variable(
            "bin_stats", "running_min",
            lambda: jnp.full((self.action_dim,), jnp.inf, jnp.float32),
        )
        self.running_max = self.variable(
            "bin_stats", "running_max",
            lambda: jnp.full((self.action_dim,), -jnp.inf, jnp.float32),
        )
        self.num_step = self.variable(
            "bin_stats", "num_step", lambda: jnp.zeros((), jnp.int32)
        )

    def _discretize(self, actions, lo, hi):
        """Uniform-bin indices matching torch bucketize(clamp(idx-1,0,nb-1)).

        torch.bucketize(x, linspace(lo, hi, nb+1)) with the reference's
        ``clamp(indices - 1, 0, nb-1)`` nets out to ceil((x-lo)/width) - 1
        clamped to range, with x exactly on an interior boundary mapping to
        the lower bin. Known ULP-level deviation: torch.linspace constructs
        boundaries from both ends, so inputs landing *exactly* on a float32
        boundary can shift one bin vs torch — a measure-zero input set for
        continuous actions (tested to within one bin in
        tests/test_tokenizer_parity.py).
        """
        width = (hi - lo) / self.num_bins
        safe_width = jnp.where(width > 0, width, 1.0)
        raw = (actions - lo[None, :]) / safe_width[None, :]
        # interior boundary values map to the lower bin: ceil(raw) - 1 for
        # exact integers, floor otherwise == ceil(raw - 1)
        idx = jnp.ceil(raw - 1.0).astype(jnp.int32)
        return jnp.clip(idx, 0, self.num_bins - 1)

    def __call__(self, actions, update_stats: bool = True):
        """actions [B, action_dim] -> embeddings [B, output_dim]."""
        if update_stats and not self.is_initializing():
            enabled = self.num_step.value < self.num_step_stop
            batch_min = jnp.min(actions, axis=0)
            batch_max = jnp.max(actions, axis=0)
            self.running_min.value = jnp.where(
                enabled,
                jnp.minimum(self.running_min.value, batch_min),
                self.running_min.value,
            )
            self.running_max.value = jnp.where(
                enabled,
                jnp.maximum(self.running_max.value, batch_max),
                self.running_max.value,
            )
            self.num_step.value = self.num_step.value + jnp.where(enabled, 1, 0)

        lo = self.running_min.value
        hi = self.running_max.value
        # before any stats update (inf bounds), fall back to batch bounds so
        # the op stays finite under jit tracing
        lo = jnp.where(jnp.isfinite(lo), lo, jnp.min(actions, axis=0))
        hi = jnp.where(jnp.isfinite(hi), hi, jnp.max(actions, axis=0))

        bin_indices = self._discretize(actions, lo, hi)  # [B, action_dim]
        # vectorized per-dimension gather: tables [A, NB, E], indices [B, A]
        emb = jnp.take_along_axis(
            self.embedding_tables[None, :, :, :],
            bin_indices[:, :, None, None],
            axis=2,
        )[:, :, 0, :]  # [B, A, E]
        flat = emb.reshape(actions.shape[0], -1)
        h = gelu_exact(self.out1(flat))
        return gelu_exact(self.out2(h))
