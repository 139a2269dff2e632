from lipvq_tpu.config.config import Config, ConfigLockError
from lipvq_tpu.config.base import (
    BaseConfig,
    REGISTERED_CONFIGS,
    config_factory,
    config_from_json,
)
from lipvq_tpu.config.algo_configs import (
    ICLConfig,
    ICLMambaConfig,
    BCConfig,
    DiffusionPolicyConfig,
)

__all__ = [
    "Config",
    "ConfigLockError",
    "BaseConfig",
    "REGISTERED_CONFIGS",
    "config_factory",
    "config_from_json",
    "ICLConfig",
    "ICLMambaConfig",
    "BCConfig",
    "DiffusionPolicyConfig",
]
