"""Parity harness: tokenizers vs torch goldens (SURVEY.md §7 Phase 1.4).

Each golden re-derives the reference math in torch (cited file:line) as a
plain function over an explicit weight dict — weights are exported from the
initialized JAX modules, so both sides run identical parameters. Asserted:
bit-identical token IDs, reconstruction/loss parity within float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lipvq_tpu.models.tokenizers.bin_action import AdaptiveBinActionEmbedding
from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE
from lipvq_tpu.models.tokenizers.vqvae import LFQVAE, VQVAE


def _t(x):
    return torch.from_numpy(np.array(x, dtype=np.float32))


# ---------------------------------------------------------------------------
# torch goldens (reference equations, independent reimplementation)
# ---------------------------------------------------------------------------

def torch_lipvq_forward(p, x):
    """Golden for LLFQVAE_V4 (reference backbone_lfqvae_v5.py:70-84)."""
    h = F.gelu(x @ _t(p["enc1"]["kernel"]) + _t(p["enc1"]["bias"]))
    h = F.gelu(h @ _t(p["enc2"]["kernel"]) + _t(p["enc2"]["bias"]))
    # LipschitzMLP (v5.py:6-24): W [out,in], L-inf row norm * softplus(ci)
    W = _t(p["to_latent"]["W"])
    absrowsum = W.abs().sum(dim=1, keepdim=True)
    scale = torch.minimum(
        torch.tensor(1.0), F.softplus(_t(p["to_latent"]["ci"])).unsqueeze(1) / absrowsum
    )
    z_e = torch.sigmoid(x_mm := h @ (W * scale).T + _t(p["to_latent"]["b"]))
    del x_mm
    # LFQQuantizer (v5.py:37-48) incl. the no-op sign mask, verbatim math
    cb = _t(p["quantizer"]["codebook"])
    z_sign = torch.clamp(2 * torch.sign(z_e) + 1, max=1).unsqueeze(1)
    d = torch.norm(z_sign * (z_e.unsqueeze(1) - cb.unsqueeze(0)), dim=-1)
    ids = torch.argmin(d, dim=-1)
    z_q = cb[ids]
    h = F.gelu(z_q @ _t(p["dec1"]["kernel"]) + _t(p["dec1"]["bias"]))
    h = F.gelu(h @ _t(p["dec2"]["kernel"]) + _t(p["dec2"]["bias"]))
    recon = h @ _t(p["to_output"]["kernel"]) + _t(p["to_output"]["bias"])
    recon_loss = F.mse_loss(recon, x)
    commit = F.mse_loss(z_q.detach(), z_e)
    codebook_loss = F.mse_loss(z_q, z_e.detach())
    loss = recon_loss + 0.25 * commit + 0.25 * codebook_loss
    return z_q, ids, loss


def torch_vqvae_forward(p, x, commitment_cost=0.25):
    """Golden for plain VQVAE (reference vq_vae/backbone.py:38-76)."""
    h = x
    for k in ("enc_0", "enc_1", "enc_2"):
        h = F.relu(h @ _t(p[k]["kernel"]) + _t(p[k]["bias"]))
    z_e = h
    emb = _t(p["embedding"])
    d = (z_e.unsqueeze(1) - emb).pow(2).sum(-1)
    ids = torch.argmin(d, dim=1)
    z_q = emb[ids]
    commit = commitment_cost * F.mse_loss(z_q.detach(), z_e)
    emb_loss = F.mse_loss(z_q, z_e.detach())
    z_q = z_e + (z_q - z_e).detach()
    h = z_q
    for k in ("dec_0", "dec_1", "dec_2"):
        h = F.relu(h @ _t(p[k]["kernel"]) + _t(p[k]["bias"]))
    recon_loss = F.mse_loss(h, x)
    return ids, recon_loss + emb_loss + commit


def torch_lfqvae_forward(p, x):
    """Golden for LFQVAE (reference vq_vae/backbone_lfqvae.py:30-50)."""
    h = x
    for k in ("enc_0", "enc_1", "enc_2"):
        h = F.relu(h @ _t(p[k]["kernel"]) + _t(p[k]["bias"]))
    z_q = F.normalize(h, p=2, dim=-1)
    h = z_q
    for k in ("dec_0", "dec_1", "dec_2"):
        h = F.relu(h @ _t(p[k]["kernel"]) + _t(p[k]["bias"]))
    return z_q, F.mse_loss(h, x)


def torch_bin_discretize(actions, running_min, running_max, num_bins):
    """Golden for AdaptiveBinActionEmbedding.discretize
    (reference bin_action/backbone.py:42-67)."""
    out = []
    for i in range(actions.shape[1]):
        bounds = torch.linspace(running_min[i], running_max[i], num_bins + 1)
        idx = torch.bucketize(actions[:, i], bounds)
        out.append(torch.clamp(idx - 1, 0, num_bins - 1))
    return torch.stack(out, dim=1)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_lipvq_parity(rng):
    feature_dim, latent_dim, num_codes = 12, 208, 1024
    model = LipVQVAE(feature_dim, latent_dim, num_codes=num_codes)
    x = rng.standard_normal((80, feature_dim), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    z_latent, loss, ids = model.apply(variables, jnp.asarray(x))

    p = jax.tree.map(np.asarray, variables["params"])
    xt = torch.from_numpy(x.copy())
    z_q_t, ids_t, loss_t = torch_lipvq_forward(p, xt)

    np.testing.assert_array_equal(np.asarray(ids), ids_t.numpy())
    np.testing.assert_allclose(
        np.asarray(z_latent), z_q_t.detach().numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-5)


def test_lipvq_gradient_boundaries(rng):
    """Gradient structure of SURVEY.md §2.3.2/3: encoder trains only via
    commitment, codebook via recon+codebook loss, and the returned latent
    carries no gradient."""
    model = LipVQVAE(4, 8, num_codes=16)
    x = jnp.asarray(rng.standard_normal((32, 4), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(1), x)

    def loss_fn(params):
        _, loss, _ = model.apply({"params": params}, x)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    # every parameter group receives gradient
    for name in ("enc1", "to_latent", "quantizer", "dec1", "to_output"):
        leaf_norms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads[name])
        total = sum(jax.tree.leaves(leaf_norms))
        assert total > 0, f"no gradient reached {name}"

    def latent_sum(params):
        z_latent, _, _ = model.apply({"params": params}, x)
        return jnp.sum(z_latent)

    zgrads = jax.grad(latent_sum)(variables["params"])
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(zgrads))
    assert total == 0.0, "z_latent must be stop-gradient'ed (SURVEY §2.3.3)"


def test_vqvae_parity(rng):
    model = VQVAE(12, 208, num_embeddings=512)
    x = rng.standard_normal((80, 12), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(2), jnp.asarray(x))
    _, loss, ids = model.apply(variables, jnp.asarray(x))

    p = jax.tree.map(np.asarray, variables["params"])
    ids_t, loss_t = torch_vqvae_forward(p, torch.from_numpy(x.copy()))
    np.testing.assert_array_equal(np.asarray(ids), ids_t.numpy())
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-5)


def test_lfqvae_parity(rng):
    model = LFQVAE(12, 64)
    x = rng.standard_normal((40, 12), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x))
    z_latent, loss = model.apply(variables, jnp.asarray(x))
    p = jax.tree.map(np.asarray, variables["params"])
    z_t, loss_t = torch_lfqvae_forward(p, torch.from_numpy(x.copy()))
    np.testing.assert_allclose(np.asarray(z_latent), z_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-5)


def test_bin_discretize_parity(rng):
    """Bin indices match torch bucketize-then-clamp on generic inputs;
    values exactly on float32 boundaries may differ by at most one bin
    (torch.linspace builds boundaries from both ends — documented ULP-level
    deviation in bin_action.py)."""
    action_dim, num_bins = 3, 20
    model = AdaptiveBinActionEmbedding(action_dim, 32, num_bins=num_bins)
    lo = np.array([-1.0, 0.0, -2.0], np.float32)
    hi = np.array([1.0, 4.0, 2.0], np.float32)
    a = rng.uniform(-1.2, 1.2, (200, action_dim)).astype(np.float32) * (hi - lo) + lo

    idx_t = torch_bin_discretize(
        torch.from_numpy(a.copy()), torch.from_numpy(lo), torch.from_numpy(hi), num_bins
    ).numpy()

    variables = model.init(jax.random.PRNGKey(4), jnp.asarray(a), update_stats=False)
    bound = model.bind(variables)
    idx_j = np.asarray(
        bound._discretize(jnp.asarray(a), jnp.asarray(lo), jnp.asarray(hi))
    )
    np.testing.assert_array_equal(idx_j, idx_t)

    # exact boundary values: within one bin of torch
    boundary_vals = np.stack(
        [np.linspace(lo[i], hi[i], num_bins + 1) for i in range(action_dim)], axis=1
    ).astype(np.float32)
    idx_tb = torch_bin_discretize(
        torch.from_numpy(boundary_vals.copy()),
        torch.from_numpy(lo),
        torch.from_numpy(hi),
        num_bins,
    ).numpy()
    idx_jb = np.asarray(
        bound._discretize(jnp.asarray(boundary_vals), jnp.asarray(lo), jnp.asarray(hi))
    )
    assert np.max(np.abs(idx_jb - idx_tb)) <= 1


def test_bin_running_stats(rng):
    model = AdaptiveBinActionEmbedding(2, 16, num_bins=5, num_step_stop=3)
    variables = model.init(jax.random.PRNGKey(5), jnp.zeros((4, 2)))
    batches = [rng.standard_normal((8, 2)).astype(np.float32) for _ in range(5)]
    state = variables
    for b in batches:
        out, mutated = model.apply(
            state, jnp.asarray(b), update_stats=True, mutable=["bin_stats"]
        )
        state = {"params": state["params"], **mutated}
    # stats frozen after num_step_stop=3 batches
    expected_min = np.min(np.concatenate(batches[:3]), axis=0)
    expected_max = np.max(np.concatenate(batches[:3]), axis=0)
    np.testing.assert_allclose(
        np.asarray(state["bin_stats"]["running_min"]), expected_min, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state["bin_stats"]["running_max"]), expected_max, rtol=1e-6
    )
    assert int(state["bin_stats"]["num_step"]) == 3
