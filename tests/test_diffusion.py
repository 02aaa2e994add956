"""Scheduler numerics tests. Golden values are derived independently in numpy
from the published DDPM/DDIM equations with the reference's exact config
(`configs/modules/scheduler.yaml`: scaled_linear 0.00085..0.012, 1000 steps,
steps_offset=1, set_alpha_to_one=false, fixed_small variance)."""

import jax
import jax.numpy as jnp
import numpy as np

from seeme_tpu.diffusion import DiffusionSchedule, ddim_sample, ddpm_sample


def reference_schedule():
    return DiffusionSchedule()


class TestScheduleArrays:
    def test_scaled_linear_betas_golden(self):
        s = reference_schedule()
        betas = np.asarray(s.betas)
        # independent numpy derivation
        expect = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
        np.testing.assert_allclose(betas, expect, rtol=1e-6)
        acp = np.cumprod(1 - expect)
        np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-5)

    def test_ddim_timesteps_leading_spacing(self):
        s = reference_schedule()
        ts = s.ddim_timesteps(50)
        # diffusers: arange(50)*20 reversed, +steps_offset(=1)
        expect = (np.arange(50) * 20)[::-1] + 1
        np.testing.assert_array_equal(ts, expect)
        assert ts[0] == 981 and ts[-1] == 1

    def test_add_noise_limits(self):
        s = reference_schedule()
        x0 = jnp.ones((2, 1, 4))
        noise = jnp.full((2, 1, 4), 2.0)
        early = s.add_noise(x0, noise, jnp.array([0, 0]))
        acp0 = float(s.alphas_cumprod[0])
        np.testing.assert_allclose(
            early, np.sqrt(acp0) * 1 + np.sqrt(1 - acp0) * 2, rtol=1e-5
        )
        late = s.add_noise(x0, noise, jnp.array([999, 999]))
        acpT = float(s.alphas_cumprod[999])
        np.testing.assert_allclose(
            late, np.sqrt(acpT) * 1 + np.sqrt(1 - acpT) * 2, rtol=1e-4
        )


class TestDdimStep:
    def test_perfect_denoiser_recovers_x0(self):
        """If the model returns the true noise at every step, DDIM with eta=0
        must walk x_T back to x_0 exactly (one-step consistency check)."""
        s = reference_schedule()
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(2, 1, 8).astype(np.float32))
        noise = jnp.asarray(rng.randn(2, 1, 8).astype(np.float32))
        t = jnp.array(981)
        xt = s.add_noise(x0, noise, jnp.array([981, 981]))
        # exact epsilon -> pred_x0 == x0; with eta=0 the update is deterministic
        prev = s.ddim_step(noise, t, xt, num_inference_steps=50)
        acp_prev = float(s.alphas_cumprod[981 - 20])
        expect = np.sqrt(acp_prev) * np.asarray(x0) + np.sqrt(1 - acp_prev) * np.asarray(noise)
        np.testing.assert_allclose(prev, expect, atol=1e-5)

    def test_final_step_uses_acp0_when_not_alpha_one(self):
        s = reference_schedule()
        x0 = jnp.ones((1, 1, 4))
        noise = jnp.zeros((1, 1, 4))
        t = jnp.array(1)
        xt = s.add_noise(x0, noise, jnp.array([1]))
        prev = s.ddim_step(noise, t, xt, num_inference_steps=50)
        # set_alpha_to_one=false -> final alpha = acp[0], NOT 1
        acp0 = float(s.alphas_cumprod[0])
        np.testing.assert_allclose(prev, np.sqrt(acp0) * np.ones((1, 1, 4)), atol=1e-5)

    def test_sample_prediction_type(self):
        s = DiffusionSchedule(prediction_type="sample")
        rng = np.random.RandomState(1)
        x0 = jnp.asarray(rng.randn(2, 1, 8).astype(np.float32))
        noise = jnp.asarray(rng.randn(2, 1, 8).astype(np.float32))
        xt = s.add_noise(x0, noise, jnp.array([981, 981]))
        prev = s.ddim_step(x0, jnp.array(981), xt, num_inference_steps=50)
        acp_prev = float(s.alphas_cumprod[961])
        expect = np.sqrt(acp_prev) * np.asarray(x0) + np.sqrt(1 - acp_prev) * np.asarray(noise)
        np.testing.assert_allclose(prev, expect, atol=1e-4)


class TestDdpmStep:
    def test_t0_is_noiseless(self):
        s = reference_schedule()
        sample = jnp.ones((1, 1, 4))
        eps = jnp.zeros((1, 1, 4))
        big_noise = jnp.full((1, 1, 4), 100.0)
        out = s.ddpm_step(eps, jnp.array(0), sample, big_noise)
        assert float(jnp.abs(out).max()) < 50.0  # noise not injected at t=0

    def test_posterior_mean_formula(self):
        s = reference_schedule()
        rng = np.random.RandomState(2)
        x0 = rng.randn(1, 1, 4).astype(np.float32)
        eps = rng.randn(1, 1, 4).astype(np.float32)
        t = 500
        acp = np.asarray(s.alphas_cumprod)
        xt = np.sqrt(acp[t]) * x0 + np.sqrt(1 - acp[t]) * eps
        out = s.ddpm_step(jnp.asarray(eps), jnp.array(t), jnp.asarray(xt), jnp.zeros((1, 1, 4)))
        beta_t = 1 - acp[t] / acp[t - 1]
        alpha_t = 1 - beta_t
        mean = (
            np.sqrt(acp[t - 1]) * beta_t / (1 - acp[t]) * x0
            + np.sqrt(alpha_t) * (1 - acp[t - 1]) / (1 - acp[t]) * xt
        )
        np.testing.assert_allclose(out, mean, atol=1e-4)


class TestSamplingLoops:
    def test_ddim_loop_shapes_and_determinism(self):
        s = reference_schedule()
        den = lambda x, t, rng: x * 0.1  # arbitrary fixed function
        out1 = jax.jit(
            lambda r: ddim_sample(den, s, r, (2, 1, 8), num_inference_steps=10)
        )(jax.random.PRNGKey(0))
        out2 = ddim_sample(den, s, jax.random.PRNGKey(0), (2, 1, 8), num_inference_steps=10)
        assert out1.shape == (2, 1, 8)
        np.testing.assert_allclose(out1, out2, atol=1e-5)

    def test_cfg_doubles_batch(self):
        s = reference_schedule()
        seen = []

        def den(x, t, rng):
            seen.append(x.shape[0])
            return x * 0.1

        out = ddim_sample(
            den, s, jax.random.PRNGKey(0), (2, 1, 8), num_inference_steps=5, guidance_scale=2.5
        )
        assert out.shape == (2, 1, 8)
        assert seen[0] == 4  # doubled batch [uncond; cond]

    def test_ddpm_loop_runs(self):
        s = DiffusionSchedule(num_train_timesteps=20)
        den = lambda x, t, rng: jnp.zeros_like(x)
        out = ddpm_sample(den, s, jax.random.PRNGKey(0), (1, 1, 4))
        assert out.shape == (1, 1, 4)
        assert bool(jnp.all(jnp.isfinite(out)))
