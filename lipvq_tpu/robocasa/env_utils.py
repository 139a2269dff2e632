"""RoboCasa environment helpers.

Counterpart of reference robocasa/utils/env_utils.py:16-50:
``create_env`` (kitchen env construction with layout/style/seed kwargs)
and ``run_random_rollouts`` (random-action episodes with success stats).
Kitchen envs require robosuite+robocasa installed; the synthetic env
keeps the API exercisable hermetically.
"""

from __future__ import annotations

import numpy as np

from lipvq_tpu.envs.env_factory import create_env_from_metadata


def create_env(env_name: str, render: bool = False,
               render_offscreen: bool = False, seed: int | None = None,
               layout_ids=None, style_ids=None, **kwargs):
    env_meta = {
        "env_name": env_name,
        "type": 1 if env_name != "SyntheticKitchen" else 99,
        "env_kwargs": dict(kwargs),
    }
    if layout_ids is not None:
        env_meta["env_kwargs"]["layout_ids"] = layout_ids
    if style_ids is not None:
        env_meta["env_kwargs"]["style_ids"] = style_ids
    if seed is not None:
        env_meta["env_kwargs"]["seed"] = seed
    return create_env_from_metadata(
        env_meta, render=render, render_offscreen=render_offscreen
    )


def run_random_rollouts(env, num_rollouts: int, num_steps: int,
                        video_path: str | None = None, seed: int = 0):
    """Random-action episodes; returns success/horizon stats
    (reference env_utils.py run_random_rollouts)."""
    rng = np.random.default_rng(seed)
    writer = None
    if video_path is not None:
        import imageio

        writer = imageio.get_writer(video_path, fps=20)
    successes, horizons = [], []
    for _ in range(num_rollouts):
        env.reset()
        success = False
        t = 0
        for t in range(num_steps):
            a = rng.uniform(-1, 1, env.action_dimension)
            _, _, done, info = env.step(a)
            success = success or bool(
                info.get("is_success", {}).get("task", False)
            )
            if writer is not None:
                writer.append_data(
                    env.render(mode="rgb_array", height=256, width=256)
                )
            if done:
                break
        successes.append(float(success))
        horizons.append(t + 1)
    if writer is not None:
        writer.close()
    return {
        "num_success_rollouts": int(np.sum(successes)),
        "average_horizon": float(np.mean(horizons)),
    }
