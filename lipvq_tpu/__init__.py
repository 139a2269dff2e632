"""lipvq_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of andvg3/LipVQ-VAE ("Action Tokenizer Matters in In-Context
Imitation Learning", IROS 2025).

Layer map (mirrors the reference's structure, re-designed TPU-first):

- ``lipvq_tpu.config``    — locked-dict config kernel + per-algo config registry
  (reference: robomimic/config/config.py, base_config.py)
- ``lipvq_tpu.data``      — HDF5 sequence datasets + host->device feeding
  (reference: robomimic/utils/dataset.py)
- ``lipvq_tpu.models``    — flax modules: base nets, obs encoders, GPT/Mamba
  backbones, policy heads, and the swappable action tokenizers
  (reference: robomimic/models/*)
- ``lipvq_tpu.ops``       — Pallas TPU kernels + XLA reference implementations
  (fused VQ codebook lookup, selective scan)
- ``lipvq_tpu.algo``      — algorithms (ICL, BC, ...) with jitted train steps
  (reference: robomimic/algo/*)
- ``lipvq_tpu.parallel``  — mesh construction, sharding rules, pjit'd corpus
  tokenization (TPU-native replacement for the reference's single-GPU loop)
- ``lipvq_tpu.envs``      — environment abstraction for closed-loop eval
  (reference: robomimic/envs/*)
- ``lipvq_tpu.utils``     — obs/tensor/train/log/file utilities
"""

__version__ = "0.1.0"
