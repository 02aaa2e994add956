"""ConditionalGlow bijector tests, mirroring the reference's nflows suite
pattern (`nflows/tests/`: forward/inverse invertibility + logabsdet
correctness per transform, log_prob consistency for the composed flow)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.flows.glow import (
    GlowConfig,
    glow_forward,
    glow_inverse,
    glow_log_prob,
    glow_sample_and_log_prob,
    init_glow,
    initialize_actnorm,
)

CFG = GlowConfig(features=12, hidden_features=32, num_layers=3,
                 num_blocks_per_layer=2, context_features=7)


# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def flow():
    params = init_glow(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, CFG.features).astype(np.float32)) * 2 + 1
    ctx = jnp.asarray(rng.randn(32, 7).astype(np.float32))
    params = initialize_actnorm(params, CFG, x, ctx)
    # perturb so LU / couplings are non-trivial
    params = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1), a.shape), params
    )
    return params, x, ctx


class TestInvertibility:
    def test_forward_inverse_roundtrip(self, flow):
        params, x, ctx = flow
        z, ld_f = glow_forward(params, CFG, x, ctx)
        x2, ld_i = glow_inverse(params, CFG, z, ctx)
        np.testing.assert_allclose(x2, x, atol=2e-4)
        np.testing.assert_allclose(ld_f + ld_i, 0.0, atol=1e-4)

    def test_inverse_forward_roundtrip(self, flow):
        params, x, ctx = flow
        z = jnp.asarray(np.random.RandomState(1).randn(8, CFG.features).astype(np.float32))
        s, _ = glow_inverse(params, CFG, z, ctx[:8])
        z2, _ = glow_forward(params, CFG, s, ctx[:8])
        np.testing.assert_allclose(z2, z, atol=2e-4)


class TestLogAbsDet:
    def test_matches_numerical_jacobian(self, flow):
        params, x, ctx = flow
        x1, ctx1 = x[:1], ctx[:1]
        _, ld = glow_forward(params, CFG, x1, ctx1)
        J = jax.jacfwd(lambda xx: glow_forward(params, CFG, xx[None], ctx1)[0][0])(x1[0])
        _, expected = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(float(ld[0]), expected, rtol=1e-3)


class TestActNormInit:
    def test_post_init_statistics(self):
        """After data-dependent init, the first ActNorm's outputs should have
        ~zero mean and ~unit std (`normalization.py:196-221`)."""
        params = init_glow(jax.random.PRNGKey(2), CFG)
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(512, CFG.features).astype(np.float32) * 3 - 2)
        ctx = jnp.asarray(rng.randn(512, 7).astype(np.float32))
        params = initialize_actnorm(params, CFG, x, ctx)
        p = params["layers"][0]["actnorm"]
        y = jnp.exp(p["log_scale"]) * x + p["shift"]
        np.testing.assert_allclose(np.asarray(y.mean(0)), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y.std(0, ddof=1)), 1.0, atol=1e-2)


class TestFlowDistribution:
    def test_log_prob_of_samples_consistent(self, flow):
        """log_prob(sample_and_log_prob(...)) must agree — the nflows contract
        test (`tests/flows/base_test.py:61-69`)."""
        params, x, ctx = flow
        samples, log_prob_s, noise = glow_sample_and_log_prob(
            params, CFG, 3, ctx[:4], rng=jax.random.PRNGKey(3)
        )
        ctx_rep = jnp.repeat(ctx[:4], 3, axis=0)
        log_prob_d, noise2 = glow_log_prob(params, CFG, samples, ctx_rep)
        np.testing.assert_allclose(np.asarray(log_prob_s), np.asarray(log_prob_d), rtol=2e-3)
        np.testing.assert_allclose(np.asarray(noise), np.asarray(noise2), atol=2e-4)

    def test_identity_init_is_standard_normal(self):
        """With identity init (zero actnorm/coupling-ish), log_prob before
        perturbation should be close to the standard-normal density."""
        cfg = GlowConfig(features=6, hidden_features=16, num_layers=2,
                         num_blocks_per_layer=1, context_features=None,
                         use_batch_norm=False)
        params = init_glow(jax.random.PRNGKey(4), cfg)
        x = jnp.zeros((2, 6))
        lp, z = glow_log_prob(params, cfg, x)
        # identity LU + zero actnorm -> z ~ x + tiny coupling shift
        expected = -0.5 * 6 * math.log(2 * math.pi)
        np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-2)

    def test_mode_sample_z0(self, flow):
        """ProHMR's 'mode' prediction is the flow evaluated at z=0
        (`prohmr_scene.py:146-161`)."""
        params, x, ctx = flow
        noise = jnp.zeros((4, 1, CFG.features))
        samples, lp, _ = glow_sample_and_log_prob(params, CFG, 1, ctx[:4], noise=noise)
        assert samples.shape == (4, CFG.features)
        assert np.isfinite(np.asarray(lp)).all()

    def test_context_changes_samples(self, flow):
        params, x, ctx = flow
        noise = jnp.zeros((2, 1, CFG.features))
        s1, _, _ = glow_sample_and_log_prob(params, CFG, 1, ctx[:2], noise=noise)
        s2, _, _ = glow_sample_and_log_prob(params, CFG, 1, ctx[2:4], noise=noise)
        assert not np.allclose(s1, s2, atol=1e-5)


def test_jit_log_prob(flow):
    params, x, ctx = flow
    f = jax.jit(lambda p, xx, cc: glow_log_prob(p, CFG, xx, cc)[0])
    lp = f(params, x, ctx)
    assert lp.shape == (32,)
    assert np.isfinite(np.asarray(lp)).all()
