"""Register a custom observation modality + encoder core
(counterpart of reference examples/add_new_modality.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from lipvq_tpu.utils import obs_utils as ObsUtils
from lipvq_tpu.models.obs_nets import ObservationEncoder, obs_spec


def main():
    # 1. register key->modality mappings directly (the config path does
    # this automatically from observation.modalities)
    ObsUtils.register_obs_keys({"tactile": "low_dim", "depth_map": "rgb"})
    print("tactile modality:", ObsUtils.OBS_KEYS_TO_MODALITIES["tactile"])

    # 2. per-modality processing: rgb-like keys scale to [0, 1]
    raw = (np.random.rand(4, 16, 16, 3) * 255).astype(np.uint8)
    processed = ObsUtils.process_obs(raw, obs_key="depth_map")
    print("processed range:", processed.min(), processed.max())

    # 3. encoders pick cores per key via the encoder_cores spec
    spec = obs_spec({"tactile": (6,), "depth_map": (16, 16, 3)})
    enc = ObservationEncoder(
        spec,
        encoder_cores=(("depth_map", "VisualCore:feature_dimension=8,num_kp=4"),),
    )
    obs = {
        "tactile": jnp.zeros((2, 6)),
        "depth_map": jnp.zeros((2, 16, 16, 3)),
    }
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        obs,
    )
    out = enc.apply(variables, obs)
    print("encoded:", out.shape)  # 6 low-dim + 8 visual features


if __name__ == "__main__":
    main()
