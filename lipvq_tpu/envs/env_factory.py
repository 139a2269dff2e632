"""Environment factory from dataset env metadata.

Counterpart of reference EnvUtils.create_env_from_metadata (driven by the
``env_args`` json stored in dataset HDF5 attrs — reference
scripts/train.py:84,135 and SURVEY.md A.1). Adapters are import-gated:
robosuite/robocasa envs engage when those packages are installed;
gymnasium adapts type-2; the synthetic env keeps hermetic CI running.
"""

from __future__ import annotations

from lipvq_tpu.envs.env_base import EnvType


def create_env_from_metadata(env_meta: dict, render: bool = False,
                             render_offscreen: bool = False, **kwargs):
    env_name = env_meta["env_name"]
    env_type = env_meta.get("type", None)
    env_kwargs = dict(env_meta.get("env_kwargs", {}))
    env_kwargs.update(kwargs)

    if env_name == "SyntheticKitchen" or env_type == EnvType.SYNTHETIC_TYPE:
        from lipvq_tpu.envs.env_synthetic import SyntheticKitchenEnv

        return SyntheticKitchenEnv(env_name=env_name, **env_kwargs)

    if env_type == EnvType.ROBOSUITE_TYPE:
        # first-party MuJoCo kitchen tasks take priority; the robosuite
        # adapter remains for external env_metas when it is installed
        from lipvq_tpu.robocasa.sim import REGISTERED_KITCHEN_ENVS

        if env_name in REGISTERED_KITCHEN_ENVS:
            from lipvq_tpu.envs.env_kitchen import EnvKitchen

            return EnvKitchen(
                env_name, render=render, render_offscreen=render_offscreen,
                **env_kwargs,
            )
        from lipvq_tpu.envs.env_robosuite import EnvRobosuite

        return EnvRobosuite(
            env_name, render=render, render_offscreen=render_offscreen,
            **env_kwargs,
        )
    if env_type == EnvType.GYM_TYPE:
        from lipvq_tpu.envs.env_gym import EnvGym

        return EnvGym(env_name, **env_kwargs)
    if env_type == EnvType.IG_MOMART_TYPE:
        from lipvq_tpu.envs.env_ig_momart import EnvIGMomart

        return EnvIGMomart(
            env_name, render=render, render_offscreen=render_offscreen,
            **env_kwargs,
        )
    raise ValueError(
        f"No environment adapter for env_meta type={env_type!r} "
        f"name={env_name!r}"
    )
