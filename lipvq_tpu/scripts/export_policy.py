"""Export a trained policy's jitted get_action as StableHLO for serving.

Production-deployment path: the exported artifact is a self-contained
serialized computation (jax.export) that any JAX-compatible runtime can
reload and run without the framework's Python model code — the TPU-native
analogue of the reference's torch.save policy payloads for inference
services.

    python -m lipvq_tpu.scripts.export_policy --ckpt model.ckpt \
        --output policy.stablehlo [--batch 1]
"""

from __future__ import annotations

import argparse


def export_policy(ckpt_path: str, output_path: str, batch: int = 1):
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from lipvq_tpu.utils.file_utils import policy_from_checkpoint

    model, ckpt = policy_from_checkpoint(ckpt_path)
    t = getattr(model, "context_length", 10)

    obs = {
        k: jnp.zeros((batch, t) + tuple(s), jnp.float32)
        for k, s in model.obs_shapes.items()
    }
    ctx_act = jnp.zeros((batch, t, model.ac_dim), jnp.float32)
    key = jax.random.PRNGKey(0)

    state = model.state

    def serve_fn(params, extra_vars, obs, ctx_obs, ctx_act, key):
        return model._get_action_impl(
            state._replace(params=params, extra_vars=extra_vars),
            obs, ctx_obs, ctx_act, None, key,
        )

    exported = jax_export.export(jax.jit(serve_fn))(
        state.params, state.extra_vars, obs, obs, ctx_act, key
    )
    blob = exported.serialize()
    with open(output_path, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)} bytes of StableHLO to {output_path}")
    return output_path


def load_and_run(path: str, model):
    """Reload an exported policy and run it (round-trip check)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    t = getattr(model, "context_length", 10)
    obs = {
        k: jnp.zeros((1, t) + tuple(s), jnp.float32)
        for k, s in model.obs_shapes.items()
    }
    ctx_act = jnp.zeros((1, t, model.ac_dim), jnp.float32)
    return exported.call(
        model.state.params, model.state.extra_vars, obs, obs, ctx_act,
        jax.random.PRNGKey(0),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()
    export_policy(args.ckpt, args.output, batch=args.batch)


if __name__ == "__main__":
    main()
