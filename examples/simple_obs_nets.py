"""Build and run the observation encoder stack directly
(counterpart of reference examples/simple_obs_nets.py)."""

import jax
import jax.numpy as jnp

from lipvq_tpu.models.obs_nets import (
    ObservationDecoder,
    ObservationGroupEncoder,
    obs_spec,
)


def main():
    spec = obs_spec({"robot0_eef_pos": (3,), "object": (10,)})
    enc = ObservationGroupEncoder(group_specs=(("obs", spec),))
    obs = {
        "robot0_eef_pos": jnp.ones((4, 3)),
        "object": jnp.zeros((4, 10)),
    }
    variables = enc.init(jax.random.PRNGKey(0), obs=obs)
    feats = enc.apply(variables, obs=obs)
    print("encoded features:", feats.shape)

    dec = ObservationDecoder(spec=obs_spec({"action": (7,)}))
    dvars = dec.init(jax.random.PRNGKey(1), feats)
    out = dec.apply(dvars, feats)
    print("decoded action:", out["action"].shape)


if __name__ == "__main__":
    main()
