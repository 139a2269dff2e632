"""Parity vs the ACTUAL reference source (VERDICT.md round-1 item 3).

Unlike test_tokenizer_parity.py (in-repo re-derived goldens), these tests
importlib-load the real PyTorch modules from /root/reference and assert
the JAX implementations reproduce them on ported weights:

- ``LLFQVAE_V4``   robomimic/models/vq_vae/backbone_lfqvae_v5.py:51-84
- ``VQVAE``        robomimic/models/vq_vae/backbone.py:6-76
- ``LFQVAE``       robomimic/models/vq_vae/backbone_lfqvae.py
- ``AdaptiveBinActionEmbedding`` robomimic/models/bin_action/backbone.py
- ``GPT_Backbone`` robomimic/models/transformers.py:321-440

Asserted: bit-identical token IDs (incl. argmin tie-breaking), latent /
output parity within float tolerance, loss parity, and — for LipVQ — the
stop-gradient boundary (parameter gradients match torch autograd).

Skipped wholesale if /root/reference is not present (the suite must stay
runnable outside the build environment).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lipvq_tpu.utils.torch_import import (  # noqa: E402
    import_bin_state_dict,
    import_gpt_backbone_state_dict,
    import_lfqvae_state_dict,
    import_lipvq_state_dict,
    import_vqvae_state_dict,
)


def _load_ref_module(relpath: str, name: str):
    """importlib-load a torch-only reference file in isolation."""
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sd_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _actions(rng, n=256, d=12):
    """Realistic action batch: smooth sinusoids (the corpus regime) plus a
    tail of large-magnitude rows that saturate the sigmoid latent — the
    regime where argmin ties actually happen (SURVEY.md §7 hard parts)."""
    t = np.arange(n, dtype=np.float32)[:, None]
    ph = rng.uniform(0, 2 * np.pi, (1, d)).astype(np.float32)
    fr = rng.uniform(0.05, 0.2, (1, d)).astype(np.float32)
    x = 0.8 * np.sin(fr * t + ph).astype(np.float32)
    x[-32:] *= 25.0  # saturation tail
    return x


# ---------------------------------------------------------------------------
# LipVQ-VAE (the paper's tokenizer)
# ---------------------------------------------------------------------------

def test_lipvq_vs_reference_source(rng):
    ref = _load_ref_module(
        "robomimic/models/vq_vae/backbone_lfqvae_v5.py", "ref_lfqvae_v5"
    )
    torch.manual_seed(0)
    tmodel = ref.LLFQVAE_V4(feature_dim=12, latent_dim=208, num_codes=1024)
    tmodel.eval()

    from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE

    params = import_lipvq_state_dict(_sd_numpy(tmodel))
    jmodel = LipVQVAE(feature_dim=12, latent_dim=208, num_codes=1024)

    x = _actions(rng)
    xt = torch.from_numpy(x.copy())
    z_t, loss_t = tmodel(xt)
    # reference quantizer exposes ids via a second forward of the quantizer
    with torch.no_grad():
        h = tmodel.encoder(xt)
        z_e = tmodel.to_latent(h)
        _, ids_t = tmodel.quantizer(z_e)

    z_j, loss_j, ids_j = jmodel.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_array_equal(np.asarray(ids_j), ids_t.numpy())
    np.testing.assert_allclose(
        np.asarray(z_j), z_t.detach().numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_lipvq_gradient_boundary_vs_reference(rng):
    """The no-STE / detach structure (backbone_lfqvae_v5.py:74-84) defines
    which params each loss term trains; grads must match torch autograd."""
    ref = _load_ref_module(
        "robomimic/models/vq_vae/backbone_lfqvae_v5.py", "ref_lfqvae_v5_g"
    )
    torch.manual_seed(1)
    tmodel = ref.LLFQVAE_V4(feature_dim=12, latent_dim=32, num_codes=64)
    tmodel.train()

    from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE

    params = import_lipvq_state_dict(_sd_numpy(tmodel))
    jmodel = LipVQVAE(feature_dim=12, latent_dim=32, num_codes=64)

    x = _actions(rng, n=64)
    xt = torch.from_numpy(x.copy())
    _, loss_t = tmodel(xt)
    loss_t.backward()
    tgrads = {k: v.grad.detach().numpy() for k, v in
              tmodel.named_parameters() if v.grad is not None}

    def loss_fn(p):
        _, loss, _ = jmodel.apply({"params": p}, jnp.asarray(x))
        return loss

    jgrads = jax.grad(loss_fn)(params)

    # encoder trains only through commitment loss; codebook through
    # codebook loss; decoder through recon — all must match exactly.
    pairs = [
        ("encoder.0.weight", jgrads["enc1"]["kernel"].T),
        ("to_latent.W", jgrads["to_latent"]["W"]),
        ("to_latent.ci", jgrads["to_latent"]["ci"]),
        ("quantizer.codebook", jgrads["quantizer"]["codebook"]),
        ("decoder.0.weight", jgrads["dec1"]["kernel"].T),
        ("to_output.weight", jgrads["to_output"]["kernel"].T),
    ]
    for tkey, jg in pairs:
        np.testing.assert_allclose(
            np.asarray(jg), tgrads[tkey], rtol=1e-4, atol=1e-6,
            err_msg=f"grad mismatch for {tkey}",
        )


# ---------------------------------------------------------------------------
# Plain VQVAE (STE) + LFQVAE
# ---------------------------------------------------------------------------

def test_vqvae_vs_reference_source(rng):
    ref = _load_ref_module(
        "robomimic/models/vq_vae/backbone.py", "ref_vqvae"
    )
    torch.manual_seed(2)
    tmodel = ref.VQVAE(feature_dim=12, latent_dim=208, num_embeddings=128)
    tmodel.eval()

    from lipvq_tpu.models.tokenizers.vqvae import VQVAE

    params = import_vqvae_state_dict(_sd_numpy(tmodel))
    jmodel = VQVAE(feature_dim=12, latent_dim=208, num_embeddings=128)

    x = _actions(rng)
    xt = torch.from_numpy(x.copy())
    z_t, loss_t = tmodel(xt)
    with torch.no_grad():
        z_e = tmodel.encoder(xt)
        d = (z_e.unsqueeze(1) - tmodel.embedding.weight).pow(2).sum(-1)
        ids_t = torch.argmin(d, dim=1)

    z_j, loss_j, ids_j = jmodel.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_array_equal(np.asarray(ids_j), ids_t.numpy())
    np.testing.assert_allclose(
        np.asarray(z_j), z_t.detach().numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_lfqvae_vs_reference_source(rng):
    ref = _load_ref_module(
        "robomimic/models/vq_vae/backbone_lfqvae.py", "ref_lfqvae"
    )
    torch.manual_seed(3)
    tmodel = ref.LFQVAE(feature_dim=12, latent_dim=208)
    tmodel.eval()

    from lipvq_tpu.models.tokenizers.vqvae import LFQVAE

    params = import_lfqvae_state_dict(_sd_numpy(tmodel))
    jmodel = LFQVAE(feature_dim=12, latent_dim=208)

    x = _actions(rng)
    z_t, loss_t = tmodel(torch.from_numpy(x.copy()))
    z_j, loss_j = jmodel.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(z_j), z_t.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


# ---------------------------------------------------------------------------
# Adaptive bin tokenizer (running stats + bucketize)
# ---------------------------------------------------------------------------

def test_bin_tokenizer_vs_reference_source(rng):
    ref = _load_ref_module(
        "robomimic/models/bin_action/backbone.py", "ref_bin"
    )
    torch.manual_seed(4)
    tmodel = ref.AdaptiveBinActionEmbedding(
        action_dim=12, output_dim=96, num_bins=20, embedding_dim=64
    )

    # drive the torch running stats with a few batches (forward updates
    # stats BEFORE discretizing, backbone.py:70-75)
    batches = [_actions(rng, n=32) for _ in range(3)]
    for b in batches[:-1]:
        tmodel(torch.from_numpy(b.copy()))
    out_t = tmodel(torch.from_numpy(batches[-1].copy()))
    ids_t = tmodel.discretize(torch.from_numpy(batches[-1].copy()))

    from lipvq_tpu.models.tokenizers.bin_action import (
        AdaptiveBinActionEmbedding,
    )

    params, stats = import_bin_state_dict(_sd_numpy(tmodel), action_dim=12)
    jmodel = AdaptiveBinActionEmbedding(
        action_dim=12, output_dim=96, num_bins=20, embedding_dim=64
    )
    variables = {"params": params, "bin_stats": stats}
    out_j = jmodel.apply(
        variables, jnp.asarray(batches[-1]), update_stats=False
    )
    lo = jnp.asarray(stats["running_min"])
    hi = jnp.asarray(stats["running_max"])
    ids_j = jmodel.apply(
        variables, jnp.asarray(batches[-1]), lo, hi,
        method=AdaptiveBinActionEmbedding._discretize,
    )

    np.testing.assert_array_equal(np.asarray(ids_j), ids_t.numpy())
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.detach().numpy(), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# GPT backbone (minGPT)
# ---------------------------------------------------------------------------

def _import_ref_transformers():
    """Import robomimic.models.transformers from the reference tree.

    base_nets imports torchvision at module level (not installed here);
    stub just enough of it — the GPT classes never touch it."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        transforms = types.ModuleType("torchvision.transforms")
        transforms.__path__ = []  # mark as package for submodule import
        transforms.Lambda = lambda *a, **k: None
        transforms.Compose = lambda *a, **k: None
        functional = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional
    import robomimic.models.transformers as ref_transformers

    return ref_transformers


@pytest.mark.parametrize("causal", [True, False], ids=["causal", "bidir"])
def test_gpt_backbone_vs_reference_source(rng, causal):
    try:
        ref_t = _import_ref_transformers()
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference transformers unimportable: {e}")

    embed_dim, T, layers, heads = 64, 30, 2, 4
    torch.manual_seed(5)
    tmodel = ref_t.GPT_Backbone(
        embed_dim=embed_dim, context_length=T, causal=causal,
        num_layers=layers, num_heads=heads, activation="gelu",
    )
    tmodel.eval()

    from lipvq_tpu.models.transformer import GPTBackbone

    params = import_gpt_backbone_state_dict(
        _sd_numpy(tmodel), num_layers=layers
    )
    jmodel = GPTBackbone(
        embed_dim=embed_dim, context_length=T, causal=causal,
        num_layers=layers, num_heads=heads, activation="gelu",
    )

    x = rng.standard_normal((4, T, embed_dim)).astype(np.float32)
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x.copy()))
    out_j = jmodel.apply({"params": params}, jnp.asarray(x), False)

    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-5
    )
