"""Unit tests for the fused VQ lookup kernel (Pallas interpret vs XLA
reference vs torch golden argmin)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lipvq_tpu.ops.vq_lookup import (
    vq_cluster_stats,
    vq_distances_reference,
    vq_nearest_pallas,
    vq_nearest_reference,
    vq_nearest_with_stats_pallas,
)


def _torch_golden_ids(z, c):
    """torch semantics of the reference lookup (backbone_lfqvae_v5.py:43-46):
    L2 norm distance + first-occurrence argmin."""
    zt = torch.from_numpy(np.asarray(z))
    ct = torch.from_numpy(np.asarray(c))
    d = torch.norm(zt.unsqueeze(1) - ct.unsqueeze(0), dim=-1)
    return torch.argmin(d, dim=-1).numpy().astype(np.int32)


@pytest.mark.parametrize("b,n,d", [(80, 128, 12), (257, 1024, 208), (8, 64, 5)])
def test_reference_matches_torch(rng, b, n, d):
    z = rng.standard_normal((b, d), dtype=np.float32)
    c = rng.standard_normal((n, d), dtype=np.float32)
    ids = np.asarray(vq_nearest_reference(jnp.asarray(z), jnp.asarray(c)))
    np.testing.assert_array_equal(ids, _torch_golden_ids(z, c))


@pytest.mark.parametrize("b,n,d", [(80, 128, 12), (300, 1024, 208), (512, 256, 64)])
def test_pallas_matches_reference(rng, b, n, d):
    z = rng.standard_normal((b, d), dtype=np.float32)
    c = rng.standard_normal((n, d), dtype=np.float32)
    ref = np.asarray(vq_nearest_reference(jnp.asarray(z), jnp.asarray(c)))
    fused = np.asarray(
        vq_nearest_pallas(jnp.asarray(z), jnp.asarray(c), block_b=128, interpret=True)
    )
    np.testing.assert_array_equal(fused, ref)


def test_sigmoid_saturated_inputs(rng):
    """LipVQ latents are sigmoid outputs that saturate near 0/1 — the tie-prone
    regime called out in SURVEY.md §7. IDs must stay bit-identical."""
    b, n, d = 400, 256, 32
    z = jax.nn.sigmoid(10.0 * rng.standard_normal((b, d)).astype(np.float32))
    z = np.asarray(z)
    c = jax.nn.sigmoid(10.0 * rng.standard_normal((n, d)).astype(np.float32))
    c = np.asarray(c)
    ref = np.asarray(vq_nearest_reference(jnp.asarray(z), jnp.asarray(c)))
    fused = np.asarray(
        vq_nearest_pallas(jnp.asarray(z), jnp.asarray(c), block_b=128, interpret=True)
    )
    np.testing.assert_array_equal(fused, ref)
    np.testing.assert_array_equal(ref, _torch_golden_ids(z, c))


def test_tie_breaking_lowest_index():
    """Duplicate codebook rows force exact ties; both paths must pick the
    lowest index (torch.argmin first-occurrence semantics)."""
    z = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    c = jnp.asarray(
        [[5.0, 5.0], [1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]], jnp.float32
    )
    ref = np.asarray(vq_nearest_reference(z, c))
    fused = np.asarray(vq_nearest_pallas(z, c, block_b=128, interpret=True))
    np.testing.assert_array_equal(ref, [1, 3])
    np.testing.assert_array_equal(fused, [1, 3])


def test_stats_kernel(rng):
    b, n, d = 300, 64, 16
    z = rng.standard_normal((b, d), dtype=np.float32)
    c = rng.standard_normal((n, d), dtype=np.float32)
    ids, counts, sums = vq_nearest_with_stats_pallas(
        jnp.asarray(z), jnp.asarray(c), block_b=128, interpret=True
    )
    ref_ids = vq_nearest_reference(jnp.asarray(z), jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    ref_counts, ref_sums = vq_cluster_stats(jnp.asarray(z), ref_ids, n)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(ref_counts), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(ref_sums), rtol=1e-5, atol=1e-5
    )


def test_distances_expand_form(rng):
    z = rng.standard_normal((40, 24), dtype=np.float32)
    c = rng.standard_normal((32, 24), dtype=np.float32)
    d2 = np.asarray(vq_distances_reference(jnp.asarray(z), jnp.asarray(c)))
    exact = np.sum((z[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    np.testing.assert_allclose(d2, exact, rtol=1e-4, atol=1e-4)
