"""Action-to-motion system tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.models.a2m import A2MConfig, A2MSystem


@pytest.fixture(scope="module")
def setup():
    cfg = A2MConfig(nfeats=150, num_frames=16, num_classes=12,
                    num_inference_timesteps=4)
    system = A2MSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng.randn(4, 16, 150).astype(np.float32) * 0.3),
        "action": jnp.asarray(rng.randint(0, 12, 4)),
        "length": jnp.array([16, 12, 16, 8]),
    }
    return cfg, system, params, batch


def test_vae_and_diffusion_losses(setup):
    cfg, system, params, batch = setup
    l1, t1 = system.vae_loss(params, batch, jax.random.PRNGKey(1))
    l2, t2 = system.diffusion_loss(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert "kl_motion" in t1 and "inst_loss" in t2


def test_sample_per_class_differs(setup):
    cfg, system, params, batch = setup
    out0 = system.sample(params, jnp.array([0, 0]), jax.random.PRNGKey(3))
    out1 = system.sample(params, jnp.array([5, 5]), jax.random.PRNGKey(3))
    assert out0.shape == (2, cfg.num_frames, cfg.nfeats)
    assert not np.allclose(out0, out1, atol=1e-4)  # class changes the sample
