"""Import PyTorch reference weights into flax params.

The parity harness's weight-porting side (SURVEY.md §7 Phase 1.4): a user
with reference-trained checkpoints loads them here and gets bit-identical
token IDs from the TPU pipeline. Mappings cover the tokenizer family:

- ``LLFQVAE_V4``  (reference vq_vae/backbone_lfqvae_v5.py state_dict:
  encoder.{0,2}.{weight,bias}, to_latent.{W,b,ci}, quantizer.codebook,
  decoder.{0,2}.{weight,bias}, to_output.{weight,bias}) -> ``LipVQVAE``
- ``VQVAE``       (vq_vae/backbone.py: encoder.{0,2,4}, decoder.{0,2,4},
  embedding.weight) -> ``VQVAE``
- ``LFQVAE``      (vq_vae/backbone_lfqvae.py) -> ``LFQVAE``
- ``AdaptiveBinActionEmbedding`` (bin_action/backbone.py:
  running_min/max, embedding_layers.{i}.weight, output_layer.{0,2}) ->
  ``AdaptiveBinActionEmbedding`` params + bin_stats

torch Linear stores weight [out, in]; flax kernels are [in, out] —
transposed here. state_dicts are accepted as {key: np.ndarray} (use
``torch.load(...); {k: v.numpy() for k, v in sd.items()}``), so this
module itself has no torch dependency.
"""

from __future__ import annotations

import numpy as np


def _lin(sd, prefix):
    return {
        "kernel": np.asarray(sd[f"{prefix}.weight"]).T.astype(np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def import_lipvq_state_dict(sd: dict) -> dict:
    """LLFQVAE_V4 torch state_dict -> LipVQVAE flax params."""
    return {
        "enc1": _lin(sd, "encoder.0"),
        "enc2": _lin(sd, "encoder.2"),
        "to_latent": {
            "W": np.asarray(sd["to_latent.W"]).astype(np.float32),
            "b": np.asarray(sd["to_latent.b"]).astype(np.float32),
            "ci": np.asarray(sd["to_latent.ci"]).astype(np.float32),
        },
        "quantizer": {
            "codebook": np.asarray(sd["quantizer.codebook"]).astype(np.float32)
        },
        "dec1": _lin(sd, "decoder.0"),
        "dec2": _lin(sd, "decoder.2"),
        "to_output": _lin(sd, "to_output"),
    }


def import_vqvae_state_dict(sd: dict) -> dict:
    """VQVAE torch state_dict -> VQVAE flax params."""
    return {
        "enc_0": _lin(sd, "encoder.0"),
        "enc_1": _lin(sd, "encoder.2"),
        "enc_2": _lin(sd, "encoder.4"),
        "dec_0": _lin(sd, "decoder.0"),
        "dec_1": _lin(sd, "decoder.2"),
        "dec_2": _lin(sd, "decoder.4"),
        "embedding": np.asarray(sd["embedding.weight"]).astype(np.float32),
    }


def import_lfqvae_state_dict(sd: dict) -> dict:
    """LFQVAE torch state_dict -> LFQVAE flax params."""
    return {
        "enc_0": _lin(sd, "encoder.0"),
        "enc_1": _lin(sd, "encoder.2"),
        "enc_2": _lin(sd, "encoder.4"),
        "dec_0": _lin(sd, "decoder.0"),
        "dec_1": _lin(sd, "decoder.2"),
        "dec_2": _lin(sd, "decoder.4"),
    }


def import_bin_state_dict(sd: dict, action_dim: int) -> tuple[dict, dict]:
    """AdaptiveBinActionEmbedding state_dict -> (params, bin_stats)."""
    tables = np.stack(
        [
            np.asarray(sd[f"embedding_layers.{i}.weight"])
            for i in range(action_dim)
        ],
        axis=0,
    ).astype(np.float32)
    params = {
        "embedding_tables": tables,
        "out1": _lin(sd, "output_layer.0"),
        "out2": _lin(sd, "output_layer.2"),
    }
    stats = {
        "running_min": np.asarray(sd["running_min"]).astype(np.float32),
        "running_max": np.asarray(sd["running_max"]).astype(np.float32),
        "num_step": np.asarray(0, np.int32),
    }
    return params, stats


def import_icl_policy_state_dict(sd: dict, num_layers: int) -> dict:
    """Reference ICLTransformerGMMActorNetwork state_dict -> params for
    ``ICLGMMActorNetwork`` (the ``net`` subtree of the algo's param tree).

    Covers the low-dim + LipVQ configuration (visual-core weights import
    separately). Reference layout (policy_nets.py:2375 over
    ICL_MIMO_Transformer, obs_nets.py:2336):
      nets.encoder.action_network.*        (LLFQVAE_V4)
      nets.embed_encoder.{weight,bias}
      params.embed_timestep                ([1, T, D] nn.Parameter)
      nets.embed_ln.{weight,bias}
      nets.transformer.nets.transformer.{i}.*  (GPT_Backbone)
      nets.transformer.nets.output_ln.*
      nets.decoder.nets.{mean,scale,logits}.{weight,bias}
    """
    vq_sd = {
        k[len("nets.encoder.action_network."):]: v
        for k, v in sd.items()
        if k.startswith("nets.encoder.action_network.")
    }
    gpt_sd = {
        k[len("nets.transformer."):]: v
        for k, v in sd.items()
        if k.startswith("nets.transformer.")
    }
    out = {
        "encoder": {"action_network": import_lipvq_state_dict(vq_sd)},
        "embed_encoder": _lin(sd, "nets.embed_encoder"),
        "embed_ln": {
            "scale": np.asarray(sd["nets.embed_ln.weight"]).astype(np.float32),
            "bias": np.asarray(sd["nets.embed_ln.bias"]).astype(np.float32),
        },
        "transformer": import_gpt_backbone_state_dict(gpt_sd, num_layers),
        "decoder": {
            f"head_{k}": _lin(sd, f"nets.decoder.nets.{k}")
            for k in ("mean", "scale", "logits")
        },
    }
    if "params.embed_timestep" in sd:
        out["embed_timestep"] = np.asarray(
            sd["params.embed_timestep"]
        ).astype(np.float32)
    return out


def _conv(sd, key):
    """torch Conv2d weight [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    return {
        "kernel": np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
        .astype(np.float32)
    }


def _bn(sd, key):
    params = {
        "scale": np.asarray(sd[f"{key}.weight"]).astype(np.float32),
        "bias": np.asarray(sd[f"{key}.bias"]).astype(np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{key}.running_mean"]).astype(np.float32),
        "var": np.asarray(sd[f"{key}.running_var"]).astype(np.float32),
    }
    return params, stats


def import_resnet18_state_dict(sd: dict, prefix: str = ""):
    """torchvision-layout ResNet-18 state_dict -> (params, batch_stats)
    for ``obs_core.ResNet18Conv``. Enables porting ImageNet / R3M / MVP
    pretrained trunks (strip their wrapper prefixes first; classifier
    fc.* keys are ignored).

    torchvision layout: conv1, bn1, layer{1..4}.{0,1}.conv{1,2}/bn{1,2}
    (+ .downsample.{0,1} on stage-entry blocks).
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: dict = {}
    stats: dict = {}

    params["stem_conv"] = _conv(sd, "conv1")
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "bn1")
    for stage in range(1, 5):
        for block in range(2):
            name = f"layer{stage}_{block}"
            tkey = f"layer{stage}.{block}"
            p: dict = {}
            s: dict = {}
            p["conv1"] = _conv(sd, f"{tkey}.conv1")
            p["bn1"], s["bn1"] = _bn(sd, f"{tkey}.bn1")
            p["conv2"] = _conv(sd, f"{tkey}.conv2")
            p["bn2"], s["bn2"] = _bn(sd, f"{tkey}.bn2")
            if f"{tkey}.downsample.0.weight" in sd:
                p["downsample_conv"] = _conv(sd, f"{tkey}.downsample.0")
                p["downsample_bn"], s["downsample_bn"] = _bn(
                    sd, f"{tkey}.downsample.1"
                )
            params[name] = p
            stats[name] = s
    return params, stats


def import_gpt_backbone_state_dict(sd: dict, num_layers: int,
                                   prefix: str = "nets.transformer.") -> dict:
    """Reference GPT_Backbone state_dict -> GPTBackbone flax params.

    Reference layout (transformers.py): nets.transformer.{i}.nets.
    {attention.nets.{qkv,output},ln1,ln2,mlp.{0,2}} + nets.output_ln.
    """
    out = {}
    for i in range(num_layers):
        b = f"{prefix}{i}.nets."
        out[f"block_{i}"] = {
            "attention": {
                "qkv": {
                    "kernel": np.asarray(
                        sd[f"{b}attention.nets.qkv.weight"]
                    ).T.astype(np.float32)
                },
                "output": _lin(sd, f"{b}attention.nets.output"),
            },
            "ln1": {
                "scale": np.asarray(sd[f"{b}ln1.weight"]).astype(np.float32),
                "bias": np.asarray(sd[f"{b}ln1.bias"]).astype(np.float32),
            },
            "ln2": {
                "scale": np.asarray(sd[f"{b}ln2.weight"]).astype(np.float32),
                "bias": np.asarray(sd[f"{b}ln2.bias"]).astype(np.float32),
            },
            "mlp_fc": _lin(sd, f"{b}mlp.0"),
            "mlp_proj": _lin(sd, f"{b}mlp.2"),
        }
    out["output_ln"] = {
        "scale": np.asarray(sd["nets.output_ln.weight"]).astype(np.float32),
        "bias": np.asarray(sd["nets.output_ln.bias"]).astype(np.float32),
    }
    return out
