"""DDPM / DDIM scheduler numerics, diffusers-compatible, jit/scan-ready.

The reference delegates to HuggingFace diffusers (`configs/modules/
scheduler.yaml`: DDIMScheduler for sampling with num_inference_timesteps=50,
eta=0, set_alpha_to_one=false, steps_offset=1; DDPMScheduler for training with
variance_type='fixed_small'; both 'scaled_linear' betas over 1000 steps,
beta_start=0.00085, beta_end=0.012, clip_sample=false). This module
re-derives the exact same arithmetic as pure functions over precomputed
schedule arrays so the whole 50-step reverse process compiles into one
`lax.scan` (see `sampling.py`).

Timestep indexing matches diffusers: DDIM inference timesteps are
``(arange(n) * (T // n))[::-1] + steps_offset``; the previous timestep inside
a step is ``t - T // n``; for prev_t < 0 the final alpha is
``alphas_cumprod[0]`` when set_alpha_to_one=false (our config) else 1.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def make_betas(
    num_train_timesteps: int, beta_start: float, beta_end: float, beta_schedule: str
) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        # diffusers betas_for_alpha_bar with cosine alpha_bar, max beta 0.999
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(num_train_timesteps, dtype=np.float64)
        return np.minimum(
            1 - alpha_bar((ts + 1) / num_train_timesteps) / alpha_bar(ts / num_train_timesteps),
            0.999,
        )
    raise ValueError(f"unknown beta schedule {beta_schedule}")


@dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed schedule arrays + step rules. One object serves both the
    DDPM forward/training process and the DDIM/DDPM reverse processes."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    clip_sample: bool = False
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    prediction_type: str = "epsilon"  # 'epsilon' | 'sample'
    # derived
    alphas_cumprod: jnp.ndarray = field(init=False, repr=False)
    # host-side copy: schedule constants must be readable WITHOUT a
    # device->host transfer (the axon relay's d2h path can fail transiently
    # with FAILED_PRECONDITION; np.asarray(alphas_cumprod) killed a bench
    # sweep that way). Host consumers (ddim_schedule_arrays, respacing)
    # read this; traced code keeps the jnp twin for tracer indexing.
    alphas_cumprod_np: np.ndarray = field(init=False, repr=False)
    betas: jnp.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        betas = make_betas(
            self.num_train_timesteps, self.beta_start, self.beta_end, self.beta_schedule
        )
        acp = np.cumprod(1.0 - betas)
        object.__setattr__(self, "betas", jnp.asarray(betas, jnp.float32))
        object.__setattr__(self, "alphas_cumprod", jnp.asarray(acp, jnp.float32))
        object.__setattr__(self, "alphas_cumprod_np", acp.astype(np.float32))

    # diffusers DDPMScheduler.init_noise_sigma == DDIMScheduler.init_noise_sigma == 1.0
    init_noise_sigma: float = 1.0

    # ------------------------------------------------------------------ train
    def add_noise(
        self, x0: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) noise (per-batch t)."""
        acp = self.alphas_cumprod[timesteps]
        shape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
        return (
            jnp.sqrt(acp).reshape(shape) * x0
            + jnp.sqrt(1.0 - acp).reshape(shape) * noise
        )

    def predict_x0(
        self, model_output: jnp.ndarray, t: jnp.ndarray, sample: jnp.ndarray
    ) -> jnp.ndarray:
        acp_t = self.alphas_cumprod[t]
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(1.0 - acp_t) * model_output) / jnp.sqrt(acp_t)
        elif self.prediction_type == "sample":
            x0 = model_output
        else:
            raise ValueError(f"unknown prediction type {self.prediction_type}")
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    # ------------------------------------------------------------------- DDIM
    def ddim_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timesteps, diffusers 'leading' spacing."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        return ts + self.steps_offset

    def _alpha_prev(self, prev_t: jnp.ndarray) -> jnp.ndarray:
        final = 1.0 if self.set_alpha_to_one else self.alphas_cumprod[0]
        return jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], final)

    def ddim_step(
        self,
        model_output: jnp.ndarray,
        t: jnp.ndarray,
        sample: jnp.ndarray,
        num_inference_steps: int,
        eta: float = 0.0,
        noise: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """One x_t -> x_{t-k} DDIM update (diffusers DDIMScheduler.step)."""
        prev_t = t - self.num_train_timesteps // num_inference_steps
        acp_t = self.alphas_cumprod[t]
        acp_prev = self._alpha_prev(prev_t)

        x0 = self.predict_x0(model_output, t, sample)
        if self.prediction_type == "epsilon":
            eps = model_output
        else:
            eps = (sample - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)

        variance = (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
        std = eta * jnp.sqrt(variance)
        dir_xt = jnp.sqrt(1.0 - acp_prev - std**2) * eps
        prev_sample = jnp.sqrt(acp_prev) * x0 + dir_xt
        if eta > 0:
            assert noise is not None, "eta > 0 requires noise"
            prev_sample = prev_sample + std * noise
        return prev_sample

    # ------------------------------------------------------------------- DDPM
    def ddpm_step(
        self,
        model_output: jnp.ndarray,
        t: jnp.ndarray,
        sample: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """One ancestral DDPM update, variance_type='fixed_small'."""
        prev_t = t - 1
        acp_t = self.alphas_cumprod[t]
        acp_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_t = 1.0 - acp_t / acp_prev
        alpha_t = 1.0 - beta_t

        x0 = self.predict_x0(model_output, t, sample)
        coeff_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
        coeff_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
        mean = coeff_x0 * x0 + coeff_xt * sample

        variance = jnp.clip((1.0 - acp_prev) / (1.0 - acp_t) * beta_t, 1e-20)
        return jnp.where(t > 0, mean + jnp.sqrt(variance) * noise, mean)


def space_timesteps(num_timesteps: int, section_counts) -> np.ndarray:
    """OpenAI guided-diffusion timestep respacing
    (`EgoHMR/diffusion/respace.py:8-61`): 'ddimN' uses stride T//N; otherwise
    comma-separated per-section counts with evenly spaced steps."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return np.arange(0, num_timesteps, i)
            raise ValueError(f"cannot create exactly {desired} steps with stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    all_steps = []
    start = 0
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        taken = []
        for _ in range(count):
            taken.append(start + round(cur))
            cur += stride
        all_steps += taken
        start += size
    return np.asarray(sorted(set(all_steps)))


def respaced_schedule(
    base: DiffusionSchedule, use_timesteps: np.ndarray
) -> Tuple["DiffusionSchedule", np.ndarray]:
    """Build a shorter schedule over a timestep subsequence
    (`EgoHMR/diffusion/respace.py:64-130` SpacedDiffusion): new betas are
    1 - acp[t_i]/acp[t_{i-1}] so alphas_cumprod is exactly the subsequence.

    Returns (schedule, timestep_map): the sampler iterates 0..len-1 over the
    new schedule while the model is called with timestep_map[t]."""
    acp = base.alphas_cumprod_np  # host copy: no d2h through the relay
    use = np.asarray(sorted(use_timesteps))
    new_acp = acp[use]
    prev = np.concatenate([[1.0], new_acp[:-1]])
    new_betas = 1.0 - new_acp / prev
    new_acp_full = np.cumprod(1.0 - new_betas)
    sched = object.__new__(DiffusionSchedule)
    for f in ("beta_start", "beta_end", "beta_schedule", "clip_sample",
              "set_alpha_to_one", "steps_offset", "prediction_type"):
        object.__setattr__(sched, f, getattr(base, f))
    object.__setattr__(sched, "num_train_timesteps", len(use))
    object.__setattr__(sched, "betas", jnp.asarray(new_betas, jnp.float32))
    object.__setattr__(sched, "alphas_cumprod", jnp.asarray(new_acp_full, jnp.float32))
    object.__setattr__(sched, "alphas_cumprod_np", new_acp_full.astype(np.float32))
    return sched, use


def snr(schedule: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio acp/(1-acp) — used by loss-weighting ablations."""
    acp = schedule.alphas_cumprod[t]
    return acp / (1.0 - acp)


def ddim_timesteps_static(schedule: DiffusionSchedule, n: int) -> Tuple[jnp.ndarray, int]:
    ts = schedule.ddim_timesteps(n)
    return jnp.asarray(ts), len(ts)
