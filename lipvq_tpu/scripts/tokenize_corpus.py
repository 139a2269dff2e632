"""Offline corpus tokenization CLI — the pjit-sharded v5e-8 path.

SURVEY.md §7 Phase 1.5 / BASELINE.json north star: tokenize every action
chunk in one or more robomimic HDF5 files through a LipVQ-VAE checkpoint
on a TPU mesh and write token ids back to the files.

    python -m lipvq_tpu.scripts.tokenize_corpus --datasets a.hdf5 b.hdf5 \
        [--ckpt model.ckpt] [--latent_dim 208] [--num_codes 1024]
"""

from __future__ import annotations

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datasets", type=str, nargs="+", required=True)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="tokenizer params (msgpack of LipVQVAE params); "
                             "random init if omitted (throughput runs)")
    parser.add_argument("--action_dim", type=int, default=12)
    parser.add_argument("--latent_dim", type=int, default=208)
    parser.add_argument("--num_codes", type=int, default=1024)
    parser.add_argument("--output_key", type=str, default="lipvq_tokens")
    parser.add_argument("--dry_run", action="store_true",
                        help="measure throughput without writing")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE
    from lipvq_tpu.parallel.corpus import tokenize_hdf5_corpus
    from lipvq_tpu.parallel.mesh import make_mesh

    model = LipVQVAE(
        feature_dim=args.action_dim, latent_dim=args.latent_dim,
        num_codes=args.num_codes,
    )
    if args.ckpt:
        from flax import serialization

        with open(args.ckpt, "rb") as f:
            blob = f.read()
        dummy = model.init(
            jax.random.PRNGKey(0), jnp.zeros((8, args.action_dim))
        )
        variables = serialization.from_bytes(dummy, blob)
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((8, args.action_dim))
        )

    mesh = make_mesh()
    print(f"mesh: {mesh.devices.size} device(s) on "
          f"{jax.default_backend()}")
    stats = tokenize_hdf5_corpus(
        model, variables, args.datasets, output_key=args.output_key,
        mesh=mesh, write=not args.dry_run,
    )
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
