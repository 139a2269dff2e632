"""DDPM / DDIM noise schedulers in JAX.

TPU-native replacement for the `diffusers` schedulers the reference
depends on (reference: robomimic/algo/diffusion_policy.py:91-105;
SURVEY.md §2.4 "JAX DDPM/DDIM schedulers"). Matches diffusers semantics:
``squaredcos_cap_v2`` / ``linear`` beta schedules, epsilon or sample
prediction, clip_sample, DDIM with set_alpha_to_one + eta=0.

Functional design: scheduler parameters are precomputed arrays in a
NamedTuple; ``add_noise`` and ``step`` are pure functions usable inside
jitted train/sampling loops (the sampling loop itself is a
``lax.fori_loop`` over static timestep tables — no data-dependent Python
control flow, SURVEY.md design stance).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(num_train_timesteps: int,
                       beta_schedule: str = "squaredcos_cap_v2",
                       beta_start: float = 1e-4,
                       beta_end: float = 2e-2) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    if beta_schedule == "squaredcos_cap_v2":
        # diffusers betas_for_alpha_bar with cos^2 schedule, max beta 0.999
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        betas = []
        for i in range(num_train_timesteps):
            t1 = i / num_train_timesteps
            t2 = (i + 1) / num_train_timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.asarray(betas, np.float64)
    raise ValueError(beta_schedule)


class SchedulerParams(NamedTuple):
    betas: jax.Array
    alphas_cumprod: jax.Array
    num_train_timesteps: int
    clip_sample: bool
    prediction_type: str


def make_scheduler(num_train_timesteps: int = 100,
                   beta_schedule: str = "squaredcos_cap_v2",
                   clip_sample: bool = True,
                   prediction_type: str = "epsilon") -> SchedulerParams:
    betas = make_beta_schedule(num_train_timesteps, beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas)
    return SchedulerParams(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        num_train_timesteps=num_train_timesteps,
        clip_sample=clip_sample,
        prediction_type=prediction_type,
    )


def add_noise(sched: SchedulerParams, sample, noise, timesteps):
    """x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps (diffusers add_noise)."""
    abar = sched.alphas_cumprod[timesteps]
    while abar.ndim < sample.ndim:
        abar = abar[..., None]
    return jnp.sqrt(abar) * sample + jnp.sqrt(1.0 - abar) * noise


def _predict_x0(sched: SchedulerParams, model_output, sample, abar_t):
    if sched.prediction_type == "epsilon":
        x0 = (sample - jnp.sqrt(1.0 - abar_t) * model_output) / jnp.sqrt(abar_t)
    elif sched.prediction_type == "sample":
        x0 = model_output
    else:
        raise ValueError(sched.prediction_type)
    if sched.clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return x0


def ddpm_step(sched: SchedulerParams, model_output, timestep, sample, key):
    """One reverse-DDPM step t -> t-1 (diffusers DDPMScheduler.step)."""
    t = timestep
    abar_t = sched.alphas_cumprod[t]
    abar_prev = jnp.where(t > 0, sched.alphas_cumprod[t - 1], 1.0)
    beta_t = sched.betas[t]
    alpha_t = 1.0 - beta_t

    x0 = _predict_x0(sched, model_output, sample, abar_t)

    # posterior mean coefficients (DDPM eq. 7)
    coef_x0 = jnp.sqrt(abar_prev) * beta_t / (1.0 - abar_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - abar_prev) / (1.0 - abar_t)
    mean = coef_x0 * x0 + coef_xt * sample

    var = jnp.clip(beta_t * (1.0 - abar_prev) / (1.0 - abar_t), 1e-20, None)
    noise = jax.random.normal(key, sample.shape, sample.dtype)
    return mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise


def ddim_step(sched: SchedulerParams, model_output, timestep, prev_timestep,
              sample):
    """One DDIM step (eta=0, deterministic; diffusers DDIMScheduler.step
    with set_alpha_to_one)."""
    abar_t = sched.alphas_cumprod[timestep]
    abar_prev = jnp.where(
        prev_timestep >= 0, sched.alphas_cumprod[prev_timestep], 1.0
    )
    x0 = _predict_x0(sched, model_output, sample, abar_t)
    eps = (sample - jnp.sqrt(abar_t) * x0) / jnp.sqrt(1.0 - abar_t)
    return jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1.0 - abar_prev) * eps


def ddpm_sample(sched: SchedulerParams, model_fn, shape, key,
                num_inference_timesteps: int | None = None):
    """Full reverse process under lax.fori_loop. ``model_fn(x, t) -> eps``."""
    n = sched.num_train_timesteps
    steps = num_inference_timesteps or n
    # diffusers set_timesteps: evenly spaced, descending
    ts = jnp.asarray(
        np.linspace(0, n - 1, steps).round().astype(np.int64)[::-1].copy()
    )
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape)

    def body(i, carry):
        x, key = carry
        key, step_key = jax.random.split(key)
        t = ts[i]
        eps = model_fn(x, jnp.full((shape[0],), t, jnp.int32))
        x = ddpm_step(sched, eps, t, x, step_key)
        return (x, key)

    x, _ = jax.lax.fori_loop(0, steps, body, (x, key))
    return x


def ddim_sample(sched: SchedulerParams, model_fn, shape, key,
                num_inference_timesteps: int = 10):
    n = sched.num_train_timesteps
    steps = num_inference_timesteps
    step_ratio = n // steps
    ts = jnp.asarray(
        (np.arange(0, steps) * step_ratio).round().astype(np.int64)[::-1].copy()
    )
    x = jax.random.normal(key, shape)

    def body(i, x):
        t = ts[i]
        prev_t = t - step_ratio
        eps = model_fn(x, jnp.full((shape[0],), t, jnp.int32))
        return ddim_step(sched, eps, t, prev_t, x)

    return jax.lax.fori_loop(0, steps, body, x)
