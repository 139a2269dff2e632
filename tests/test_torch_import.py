"""Weight-port parity: real torch modules with reference layouts -> flax
params -> bit-identical token ids / matching outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE
from lipvq_tpu.models.transformer import GPTBackbone
from lipvq_tpu.utils.torch_import import (
    import_gpt_backbone_state_dict,
    import_lipvq_state_dict,
)


def _build_torch_lipvq(feature_dim=12, latent_dim=208, num_codes=1024,
                       hidden=128):
    """Module with the reference LLFQVAE_V4's exact state_dict layout
    (backbone_lfqvae_v5.py:51-68)."""

    class ToLatent(nn.Module):
        def __init__(self):
            super().__init__()
            self.W = nn.Parameter(torch.randn(latent_dim, hidden))
            self.b = nn.Parameter(torch.zeros(latent_dim))
            self.ci = nn.Parameter(torch.ones(latent_dim))

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.Sequential(
                nn.Linear(feature_dim, 64), nn.GELU(),
                nn.Linear(64, hidden), nn.GELU(),
            )
            self.to_latent = ToLatent()
            self.quantizer = nn.Module()
            self.quantizer.codebook = nn.Parameter(
                torch.randn(num_codes, latent_dim)
            )
            self.decoder = nn.Sequential(
                nn.Linear(latent_dim, 64), nn.GELU(),
                nn.Linear(64, hidden), nn.GELU(),
            )
            self.to_output = nn.Linear(hidden, feature_dim)

        def forward(self, x):
            h = self.encoder(x)
            tl = self.to_latent
            absrow = tl.W.abs().sum(1, keepdim=True)
            scale = torch.minimum(
                torch.tensor(1.0), F.softplus(tl.ci).unsqueeze(1) / absrow
            )
            z_e = torch.sigmoid(h @ (tl.W * scale).T + tl.b)
            d = torch.norm(
                z_e.unsqueeze(1) - self.quantizer.codebook.unsqueeze(0), dim=-1
            )
            ids = torch.argmin(d, dim=-1)
            z_q = self.quantizer.codebook[ids]
            recon = self.to_output(self.decoder(z_q))
            return z_q, ids, recon

    torch.manual_seed(7)
    return M()


def test_lipvq_weight_port_bit_exact_ids(rng):
    tm = _build_torch_lipvq()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_lipvq_state_dict(sd)

    model = LipVQVAE(12, 208, num_codes=1024)
    x = rng.standard_normal((200, 12), dtype=np.float32)
    with torch.no_grad():
        z_q_t, ids_t, recon_t = tm(torch.from_numpy(x.copy()))
    z_latent, loss, ids = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(ids), ids_t.numpy())
    np.testing.assert_allclose(
        np.asarray(z_latent), z_q_t.numpy(), rtol=1e-5, atol=1e-5
    )
    # tokenize()/detokenize() round the same weights
    ids2 = model.apply({"params": params}, jnp.asarray(x),
                       method=LipVQVAE.tokenize)
    np.testing.assert_array_equal(np.asarray(ids2), ids_t.numpy())
    recon = model.apply({"params": params}, np.asarray(ids2),
                        method=LipVQVAE.detokenize)
    np.testing.assert_allclose(
        np.asarray(recon), recon_t.numpy(), rtol=1e-4, atol=1e-5
    )


def _build_torch_gpt(embed_dim=64, context_length=30, num_layers=2,
                     num_heads=4):
    """Reference GPT_Backbone state_dict layout (transformers.py:321-440),
    with its forward math."""

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.nets = nn.ModuleDict()
            attn = nn.Module()
            attn.nets = nn.ModuleDict(
                {
                    "qkv": nn.Linear(embed_dim, 3 * embed_dim, bias=False),
                    "output": nn.Linear(embed_dim, embed_dim),
                }
            )
            self.nets["attention"] = attn
            self.nets["ln1"] = nn.LayerNorm(embed_dim)
            self.nets["ln2"] = nn.LayerNorm(embed_dim)
            self.nets["mlp"] = nn.Sequential(
                nn.Linear(embed_dim, 4 * embed_dim), nn.GELU(),
                nn.Linear(4 * embed_dim, embed_dim), nn.Dropout(0.0),
            )

        def forward(self, x):
            h = self.nets["ln1"](x)
            B, T, D = h.shape
            qkv = self.nets["attention"].nets["qkv"](h)
            q, k, v = torch.chunk(qkv, 3, dim=-1)
            nh, dh = num_heads, D // num_heads
            q = q.view(B, T, nh, dh).transpose(1, 2)
            k = k.view(B, T, nh, dh).transpose(1, 2)
            v = v.view(B, T, nh, dh).transpose(1, 2)
            att = (q @ k.transpose(-2, -1)) / (dh**0.5)
            att = F.softmax(att, dim=-1)  # causal=False: no mask
            y = (att @ v).transpose(1, 2).contiguous().view(B, T, D)
            x = x + self.nets["attention"].nets["output"](y)
            x = x + self.nets["mlp"](self.nets["ln2"](x))
            return x

    class GPT(nn.Module):
        def __init__(self):
            super().__init__()
            self.nets = nn.ModuleDict()
            self.nets["transformer"] = nn.Sequential(
                *[Block() for _ in range(num_layers)]
            )
            self.nets["output_ln"] = nn.LayerNorm(embed_dim)

        def forward(self, x):
            return self.nets["output_ln"](self.nets["transformer"](x))

    torch.manual_seed(3)
    return GPT()


def _build_torch_icl_policy(obs_dim=17, ac_dim=12, embed_dim=64, t=10,
                            layers=2, heads=4, num_modes=5, latent_dim=None,
                            num_codes=32):
    """Full reference-layout ICL GMM policy (low-dim obs + LipVQ tokenizer)
    with its forward math (obs_nets.py:2545-2611 + policy_nets.py:2518-2581),
    dropout 0 and causal=False as in the paper template."""
    latent_dim = latent_dim or obs_dim
    lip = _build_torch_lipvq(
        feature_dim=ac_dim, latent_dim=latent_dim, num_codes=num_codes
    )
    gpt = _build_torch_gpt(embed_dim, 3 * t, layers, heads)

    class Policy(nn.Module):
        def __init__(self):
            super().__init__()
            self.nets = nn.ModuleDict()
            enc = nn.Module()
            enc.action_network = lip
            self.nets["encoder"] = enc
            self.nets["embed_encoder"] = nn.Linear(obs_dim, embed_dim)
            self.nets["embed_ln"] = nn.LayerNorm(embed_dim)
            self.nets["transformer"] = gpt
            dec = nn.Module()
            dec.nets = nn.ModuleDict({
                "mean": nn.Linear(embed_dim, num_modes * ac_dim),
                "scale": nn.Linear(embed_dim, num_modes * ac_dim),
                "logits": nn.Linear(embed_dim, num_modes),
            })
            self.nets["decoder"] = dec
            self.params = nn.ParameterDict({
                "embed_timestep": nn.Parameter(torch.zeros(1, t, embed_dim))
            })

        def embed(self, feats):  # [B, T, obs_dim]
            e = self.nets["embed_encoder"](feats) + self.params["embed_timestep"]
            return self.nets["embed_ln"](e)

        def forward(self, obs, ctx_obs, ctx_act):
            b = obs.shape[0]
            z, _, _ = lip(ctx_act.reshape(b * t, ac_dim))
            z = z.detach().reshape(b, t, latent_dim)
            e_obs = self.embed(obs)
            e_ctx = self.embed(ctx_obs)
            e_act = self.embed(z)
            inter = torch.stack([e_ctx, e_act], dim=2).reshape(
                b, 2 * t, e_obs.shape[-1]
            )
            h = gpt(torch.cat([inter, e_obs], dim=1))[:, -t:]
            d = self.nets["decoder"].nets
            mean = torch.tanh(d["mean"](h).reshape(b, t, num_modes, ac_dim))
            scale = F.softplus(
                d["scale"](h).reshape(b, t, num_modes, ac_dim)
            ) + 1e-4
            logits = d["logits"](h)
            return mean, scale, logits

    torch.manual_seed(11)
    m = Policy()
    # make LLFQVAE_V4's forward return (z_q, ids, recon) compatible: the
    # lipvq test module returns that triple already
    return m


def test_full_icl_policy_weight_port(rng):
    """End-to-end ICL policy checkpoint import: reference-layout torch
    policy -> flax params -> matching GMM parameters on the same inputs."""
    import jax

    from lipvq_tpu.models.policy_nets import ICLGMMActorNetwork
    from lipvq_tpu.models.obs_nets import obs_spec
    from lipvq_tpu.utils.torch_import import import_icl_policy_state_dict

    obs_dim, ac_dim, embed_dim, t, layers, heads = 17, 12, 64, 10, 2, 4
    tm = _build_torch_icl_policy(obs_dim, ac_dim, embed_dim, t, layers, heads)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params_net = import_icl_policy_state_dict(sd, num_layers=layers)

    net = ICLGMMActorNetwork(
        group_specs=(("obs", obs_spec({"object": (obs_dim,)})),),
        ac_dim=ac_dim, embed_dim=embed_dim, num_layers=layers,
        num_heads=heads, context_length=t, causal=False,
        emb_dropout=0.0, attn_dropout=0.0, block_output_dropout=0.0,
        vq_vae_enabled=True, vq_num_codes=32,
        num_modes=5, min_std=1e-4,
    )
    obs = rng.standard_normal((3, t, obs_dim)).astype(np.float32)
    ctx_obs = rng.standard_normal((3, t, obs_dim)).astype(np.float32)
    ctx_act = (rng.standard_normal((3, t, ac_dim)) * 0.4).astype(np.float32)

    with torch.no_grad():
        mean_t, scale_t, logits_t = tm(
            torch.from_numpy(obs.copy()), torch.from_numpy(ctx_obs.copy()),
            torch.from_numpy(ctx_act.copy()),
        )

    dists, aux = net.apply(
        {"params": {"net": params_net}},
        {"object": jnp.asarray(obs)}, {"object": jnp.asarray(ctx_obs)},
        jnp.asarray(ctx_act), train=False, low_noise_eval=False,
        method=ICLGMMActorNetwork.forward_train,
    )
    np.testing.assert_allclose(
        np.asarray(dists.means), mean_t.numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dists.scales), scale_t.numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dists.logits), logits_t.numpy(), rtol=2e-3, atol=2e-4
    )


def test_gpt_backbone_weight_port(rng):
    embed_dim, t, layers, heads = 64, 30, 2, 4
    tm = _build_torch_gpt(embed_dim, t, layers, heads)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_gpt_backbone_state_dict(sd, num_layers=layers)

    net = GPTBackbone(
        embed_dim=embed_dim, context_length=t, causal=False,
        attn_dropout=0.0, block_output_dropout=0.0,
        num_layers=layers, num_heads=heads,
    )
    x = rng.standard_normal((3, t, embed_dim), dtype=np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.copy())).numpy()
    out_j = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-5)


def _build_torch_resnet18():
    """torchvision-layout ResNet-18 trunk (conv1/bn1/layer1-4) with its
    forward math, for weight-port parity without torchvision installed."""

    class Block(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = F.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return F.relu(y + idn)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
            for i, (cin, cout, st) in enumerate(chans):
                setattr(self, f"layer{i+1}", nn.Sequential(
                    Block(cin, cout, st), Block(cout, cout, 1)
                ))

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            for i in range(1, 5):
                x = getattr(self, f"layer{i}")(x)
            return x

    torch.manual_seed(21)
    m = Trunk().eval()
    # randomize BN running stats so the port is actually exercised
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.8, 1.2)
    return m


def test_resnet18_weight_port(rng):
    from lipvq_tpu.models.obs_core import ResNet18Conv
    from lipvq_tpu.utils.torch_import import import_resnet18_state_dict

    tm = _build_torch_resnet18()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_resnet18_state_dict(sd)

    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    net = ResNet18Conv()
    out_j = np.asarray(net.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    ))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=2e-4)
