"""Shape/semantics tests for the VAE and denoiser (flax)."""

import jax
import jax.numpy as jnp
import numpy as np

from seeme_tpu.models import Denoiser, MotionVae, reparameterize

B, T, F = 4, 60, 75
D = 256


import pytest

# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


def make_vae():
    vae = MotionVae(nfeats=F)
    feats = jnp.zeros((B, T, F))
    params = vae.init(jax.random.PRNGKey(0), feats)
    return vae, params


class TestMotionVae:
    def test_encode_decode_shapes(self):
        vae, params = make_vae()
        rng = jax.random.PRNGKey(1)
        feats = jax.random.normal(rng, (B, T, F))
        mu, logvar = vae.apply(params, feats, method=vae.encode)
        assert mu.shape == (B, 1, D) and logvar.shape == (B, 1, D)
        z = reparameterize(rng, mu, logvar)
        out = vae.apply(params, z, T, method=vae.decode)
        assert out.shape == (B, T, F)

    def test_padding_invariance(self):
        # Frames beyond `lengths` must not influence the latent.
        vae, params = make_vae()
        rng = jax.random.PRNGKey(2)
        feats = jax.random.normal(rng, (B, T, F))
        lengths = jnp.array([30, 45, 60, 10])
        mu1, _ = vae.apply(params, feats, lengths, method=vae.encode)
        # perturb padded region only
        mask = jnp.arange(T)[None, :, None] < lengths[:, None, None]
        feats2 = jnp.where(mask, feats, feats + 100.0)
        mu2, _ = vae.apply(params, feats2, lengths, method=vae.encode)
        np.testing.assert_allclose(mu1, mu2, atol=1e-4)

    def test_reparameterize_fact(self):
        mu = jnp.ones((2, 1, 8))
        logvar = jnp.zeros((2, 1, 8))
        z0 = reparameterize(jax.random.PRNGKey(0), mu, logvar, fact=0.0)
        np.testing.assert_allclose(z0, mu, atol=1e-6)

    def test_jit_encode(self):
        vae, params = make_vae()
        enc = jax.jit(lambda p, f: vae.apply(p, f, method=vae.encode))
        mu, logvar = enc(params, jnp.ones((B, T, F)))
        assert bool(jnp.all(jnp.isfinite(mu)))


class TestDenoiser:
    def _run(self, md_trans, n_cond=2):
        den = Denoiser(nfeats=F, md_trans=md_trans)
        sample = jnp.ones((B, 1, D))
        t = jnp.full((B,), 10, jnp.int32)
        cond = jnp.ones((B, n_cond, D))
        params = den.init(jax.random.PRNGKey(0), sample, t, cond)
        out = den.apply(params, sample, t, cond)
        return out, params, den

    def test_md_trans_shapes(self):
        out, _, _ = self._run(md_trans=True)
        assert out.shape == (B, 1, D)

    def test_plain_shapes(self):
        out, _, _ = self._run(md_trans=False)
        assert out.shape == (B, 1, D)

    def test_timestep_sensitivity(self):
        _, params, den = self._run(md_trans=True)
        sample = jnp.ones((B, 1, D))
        cond = jnp.ones((B, 2, D))
        o1 = den.apply(params, sample, jnp.full((B,), 10), cond)
        o2 = den.apply(params, sample, jnp.full((B,), 900), cond)
        assert not np.allclose(o1, o2, atol=1e-4)

    def test_condition_sensitivity(self):
        _, params, den = self._run(md_trans=True)
        sample = jnp.ones((B, 1, D))
        t = jnp.full((B,), 10)
        o1 = den.apply(params, sample, t, jnp.zeros((B, 2, D)))
        o2 = den.apply(params, sample, t, jnp.ones((B, 2, D)))
        assert not np.allclose(o1, o2, atol=1e-4)

    def test_diffusion_only_mode(self):
        den = Denoiser(nfeats=F, md_trans=False, diffusion_only=True)
        sample = jnp.ones((B, T, F))
        t = jnp.full((B,), 10, jnp.int32)
        cond = jnp.ones((B, 1, D))
        lengths = jnp.array([30, 60, 10, 55])
        params = den.init(jax.random.PRNGKey(0), sample, t, cond, lengths)
        out = den.apply(params, sample, t, cond, lengths)
        assert out.shape == (B, T, F)
        # padded frames zeroed (`mld_denoiser.py:218-220`)
        assert float(jnp.abs(out[0, 30:]).max()) == 0.0
        assert float(jnp.abs(out[0, :30]).max()) > 0.0


class TestRot6dPath:
    def test_vae_loss_rot6d(self):
        import numpy as np
        from seeme_tpu.core import synthetic_smpl
        from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem

        cfg = SeeMeConfig(data_type="rot6d", motion_length=8, condition=())
        assert cfg.nfeats == 144
        smpl = synthetic_smpl(n_verts=64)
        mean = np.zeros(144, np.float32)
        std = np.ones(144, np.float32)
        system = SeeMeSystem(cfg, smpl, mean, std)
        params = system.init_params(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        batch = {
            "feats": jnp.asarray(rng.randn(2, 8, 2, 144).astype(np.float32) * 0.3),
            "transl": jnp.zeros((2, 2, 8, 3)),
            "betas": jnp.zeros((2, 2, 8, 10)),
            "length": jnp.full((2,), 8),
        }
        loss, terms = system.vae_loss(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert "recons_joints" in terms


def test_unconditional_diffusion():
    import numpy as np
    from seeme_tpu.core import synthetic_smpl
    from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem

    cfg = SeeMeConfig(motion_length=8, condition=(), num_inference_timesteps=3)
    smpl = synthetic_smpl(n_verts=64)
    system = SeeMeSystem(cfg, smpl, np.zeros(75, np.float32), np.ones(75, np.float32))
    params = system.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "feats": jnp.asarray(rng.randn(2, 8, 2, 72).astype(np.float32) * 0.3),
        "transl": jnp.zeros((2, 2, 8, 3)),
        "betas": jnp.zeros((2, 2, 8, 10)),
        "length": jnp.full((2,), 8),
    }
    loss, _ = system.diffusion_loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = system.sample(params, batch, jax.random.PRNGKey(2))
    assert out.shape == (2, 8, 75)


def test_predict_transl_false_renormalizes_translations():
    """With PREDICT_TRANSL=False the batch translations (stored normalized)
    must be renormalized before entering SMPL FK."""
    import numpy as np
    from seeme_tpu.core import synthetic_smpl
    from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem

    cfg = SeeMeConfig(motion_length=4, condition=(), predict_transl=False)
    assert cfg.nfeats == 72
    smpl = synthetic_smpl(n_verts=64)
    mean = np.zeros(75, np.float32)
    std = np.ones(75, np.float32)
    mean[72:] = 5.0  # transl mean offset
    system = SeeMeSystem(cfg, smpl, mean, std)
    feats_raw = jnp.zeros((1, 4, 72))
    transl_norm = jnp.zeros((1, 4, 3))  # normalized zero == raw 5.0
    joints = system.feats_to_joints(feats_raw, jnp.zeros((1, 4, 10)), transl_norm)
    # pelvis should sit near the renormalized translation (5, 5, 5) + rest offset
    rest = system.feats_to_joints(
        feats_raw, jnp.zeros((1, 4, 10)),
        (jnp.zeros((1, 4, 3)) - 5.0)  # normalized value giving raw 0
    )
    np.testing.assert_allclose(
        np.asarray(joints[0, 0, 0] - rest[0, 0, 0]), [5.0, 5.0, 5.0], atol=1e-4
    )


@pytest.mark.parametrize("md_trans", [True, False])
def test_denoiser_cond_mask_equals_truncation(md_trans):
    """Masked-out padded condition tokens must be exactly equivalent to the
    tokens not existing (the fixed-length clip_hidden/bert padding contract,
    ADVICE r2): masked 5-token cond == truncated 3-token cond."""
    den = Denoiser(latent_dim=(2, 32), ff_size=48, num_layers=3, num_heads=2,
                   text_encoded_dim=16, md_trans=md_trans, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    B, n_valid, n_pad = 3, 3, 2
    sample = jax.random.normal(rng, (B, 2, 32))
    t = jnp.full((B,), 411, jnp.int32)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, n_valid + n_pad, 16))
    params = den.init(jax.random.PRNGKey(2), sample, t, cond)

    mask = jnp.arange(n_valid + n_pad)[None, :] < n_valid
    mask = jnp.broadcast_to(mask, (B, n_valid + n_pad))
    out_masked = den.apply(params, sample, t, cond, cond_mask=mask)
    out_trunc = den.apply(params, sample, t, cond[:, :n_valid])
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc),
                               atol=1e-5)
    # and the junk in the padded tokens must not leak at all
    cond2 = cond.at[:, n_valid:].set(99.0)
    out_masked2 = den.apply(params, sample, t, cond2, cond_mask=mask)
    np.testing.assert_allclose(np.asarray(out_masked2),
                               np.asarray(out_masked), atol=1e-5)


def test_denoiser_trans_dec_cond_mask_equals_truncation():
    """Same contract on the trans_dec (novae) memory path."""
    den = Denoiser(latent_dim=(2, 32), ff_size=48, num_layers=2, num_heads=2,
                   text_encoded_dim=16, md_trans=False, arch="trans_dec",
                   dropout=0.0)
    B = 2
    sample = jax.random.normal(jax.random.PRNGKey(0), (B, 2, 32))
    t = jnp.full((B,), 10, jnp.int32)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, 4, 16))
    params = den.init(jax.random.PRNGKey(2), sample, t, cond)
    mask = jnp.broadcast_to(jnp.arange(4)[None] < 2, (B, 4))
    out_masked = den.apply(params, sample, t, cond, cond_mask=mask)
    out_trunc = den.apply(params, sample, t, cond[:, :2])
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc),
                               atol=1e-5)
