"""Algorithm registry — importing this package registers all algorithms."""

from lipvq_tpu.algo.base import (
    Algo,
    PolicyAlgo,
    TrainState,
    algo_factory,
    register_algo_factory_func,
)
import lipvq_tpu.algo.icl  # noqa: F401  (registers icl, icl_mamba)
import lipvq_tpu.algo.bc  # noqa: F401  (registers bc)
import lipvq_tpu.algo.diffusion_policy  # noqa: F401
import lipvq_tpu.algo.act  # noqa: F401
import lipvq_tpu.algo.iql  # noqa: F401
import lipvq_tpu.algo.td3_bc  # noqa: F401
import lipvq_tpu.algo.cql  # noqa: F401
import lipvq_tpu.algo.bcq  # noqa: F401
import lipvq_tpu.algo.gl  # noqa: F401
import lipvq_tpu.algo.hbc  # noqa: F401
import lipvq_tpu.algo.mcr  # noqa: F401

__all__ = [
    "Algo",
    "PolicyAlgo",
    "TrainState",
    "algo_factory",
    "register_algo_factory_func",
]
