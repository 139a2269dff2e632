"""Convert a reference PyTorch checkpoint into this framework's format.

User-facing migration path (SURVEY.md §7 Phase 1.4): reference
``torch.save`` payloads ({model: state_dict, config, ...},
train_utils.py:1216-1234) convert into flax params. Supports the
LipVQ-VAE tokenizer alone or the full low-dim ICL GMM policy.

    python -m lipvq_tpu.scripts.import_torch_ckpt --torch_ckpt model.pth \
        --output params.msgpack [--component lipvq|icl_policy]
"""

from __future__ import annotations

import argparse


def load_torch_state_dict(path: str, model_key: str = "model") -> dict:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload[model_key] if isinstance(payload, dict) and model_key in payload else payload
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def convert(sd: dict, component: str, num_layers: int = 6) -> dict:
    from lipvq_tpu.utils import torch_import as TI

    if component == "lipvq":
        # accept either bare LLFQVAE_V4 keys or the nested policy path
        prefix = "nets.policy.nets.encoder.action_network."
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
        return TI.import_lipvq_state_dict(sd)
    if component == "icl_policy":
        prefix = "nets.policy."
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
        return TI.import_icl_policy_state_dict(sd, num_layers=num_layers)
    if component == "resnet18":
        # torchvision / R3M ("module.convnet.") / MVP trunk layouts
        for prefix in ("module.convnet.", "convnet.", "backbone.", ""):
            if any(k.startswith(prefix + "conv1.") for k in sd):
                params, stats = TI.import_resnet18_state_dict(sd, prefix)
                return {"params": params, "batch_stats": stats}
        raise ValueError("no torchvision-layout resnet18 keys found")
    raise ValueError(component)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--component", type=str, default="lipvq",
                        choices=["lipvq", "icl_policy"])
    parser.add_argument("--num_layers", type=int, default=6)
    args = parser.parse_args()

    from flax import serialization

    sd = load_torch_state_dict(args.torch_ckpt)
    converted = convert(sd, args.component, num_layers=args.num_layers)
    if "params" not in converted:
        converted = {"params": converted}
    params = converted["params"]
    with open(args.output, "wb") as f:
        f.write(serialization.msgpack_serialize(converted))
    print(f"wrote {args.output} "
          f"({sum(v.size for v in __import__('jax').tree.leaves(params))} "
          f"parameters)")


if __name__ == "__main__":
    main()
