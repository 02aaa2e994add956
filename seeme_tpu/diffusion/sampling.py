"""Reverse-process sampling loops compiled as a single `lax.scan`.

The reference's `_diffusion_reverse` (`mld/models/modeltype/mld.py:432-511`)
is a Python loop over 50 DDIM steps — 50 separate CUDA launches per batch.
Here the whole loop is one scanned XLA program: the denoiser body is traced
once, classifier-free guidance runs cond/uncond as one doubled batch inside
the scan (matching `mld.py:467-497`), and the scheduler arithmetic is gathered
from precomputed schedule arrays.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .schedulers import DiffusionSchedule

# denoiser_fn(sample (B,N,D), t (B,), step_rng) -> model_output (B,N,D)
DenoiserFn = Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray]


def ddim_sample(
    denoiser_fn: DenoiserFn,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: tuple,
    num_inference_steps: int = 50,
    eta: float = 0.0,
    guidance_scale: float = 1.0,
    dtype=jnp.float32,
    z_init: jnp.ndarray = None,
) -> jnp.ndarray:
    """Draw x_0 samples of `shape` via the DDIM reverse process.

    When guidance_scale > 1, `denoiser_fn` must accept a doubled batch
    [uncond; cond] and the outputs are mixed as
    `uncond + s * (cond - uncond)` (`mld.py:488-492`). The caller builds the
    doubled conditioning into its closure — this keeps the scan body a single
    jitted denoiser call either way.

    z_init: optional externally-drawn initial noise (already at unit std;
    scaled by init_noise_sigma here) — the deterministic-replay hook used by
    cross-framework parity harnesses (tools/preflight.py --end-to-end).
    """
    rng, init_rng = jax.random.split(rng)
    latents = (jnp.asarray(z_init, dtype) if z_init is not None
               else jax.random.normal(init_rng, shape, dtype))
    latents = latents * schedule.init_noise_sigma

    timesteps = jnp.asarray(schedule.ddim_timesteps(num_inference_steps))
    do_cfg = guidance_scale > 1.0

    def body(carry, t):
        latents, rng = carry
        rng, step_rng, noise_rng = jax.random.split(rng, 3)
        model_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
        t_batch = jnp.full((model_in.shape[0],), t, jnp.int32)
        pred = denoiser_fn(model_in, t_batch, step_rng)
        if do_cfg:
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance_scale * (cond - uncond)
        noise = jax.random.normal(noise_rng, latents.shape, dtype) if eta > 0 else None
        latents = schedule.ddim_step(pred, t, latents, num_inference_steps, eta, noise)
        return (latents, rng), None

    (latents, _), _ = jax.lax.scan(body, (latents, rng), timesteps)
    return latents


def ddpm_sample(
    denoiser_fn: DenoiserFn,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: tuple,
    guidance_scale: float = 1.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Full ancestral DDPM reverse process (num_train_timesteps steps)."""
    rng, init_rng = jax.random.split(rng)
    latents = jax.random.normal(init_rng, shape, dtype)
    timesteps = jnp.arange(schedule.num_train_timesteps - 1, -1, -1)
    do_cfg = guidance_scale > 1.0

    def body(carry, t):
        latents, rng = carry
        rng, step_rng, noise_rng = jax.random.split(rng, 3)
        model_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
        t_batch = jnp.full((model_in.shape[0],), t, jnp.int32)
        pred = denoiser_fn(model_in, t_batch, step_rng)
        if do_cfg:
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance_scale * (cond - uncond)
        noise = jax.random.normal(noise_rng, latents.shape, dtype)
        latents = schedule.ddpm_step(pred, t, latents, noise)
        return (latents, rng), None

    (latents, _), _ = jax.lax.scan(body, (latents, rng), timesteps)
    return latents


def ddim_sample_with_trajectory(
    denoiser_fn: DenoiserFn,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: tuple,
    num_inference_steps: int = 50,
    guidance_scale: float = 1.0,
    dtype=jnp.float32,
):
    """Like ddim_sample but also returns all intermediate latents
    (the `_diffusion_reverse_tsne` path, `mld.py:513-580`)."""
    rng, init_rng = jax.random.split(rng)
    latents = jax.random.normal(init_rng, shape, dtype) * schedule.init_noise_sigma
    timesteps = jnp.asarray(schedule.ddim_timesteps(num_inference_steps))
    do_cfg = guidance_scale > 1.0

    def body(carry, t):
        latents, rng = carry
        rng, step_rng = jax.random.split(rng)
        model_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
        t_batch = jnp.full((model_in.shape[0],), t, jnp.int32)
        pred = denoiser_fn(model_in, t_batch, step_rng)
        if do_cfg:
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance_scale * (cond - uncond)
        latents = schedule.ddim_step(pred, t, latents, num_inference_steps)
        return (latents, rng), latents

    (latents, _), traj = jax.lax.scan(body, (latents, rng), timesteps)
    return latents, traj
