"""CFG through the fused sampler in SeeMeSystem (VERDICT r4 missing #4).

The reference documents guidance_scale in [1.0, 7.5]
(`configs/config_mld_egobody.yaml:121`, CFG mixing at `mld.py:488-492`);
round 4's kernel gate excluded guidance > 1 from the fused route. These
tests pin the new routing (CFG reaches `ddim_fused` with the doubled
[uncond; cond] batch and the config's scale) and the system-level numeric
parity of the fused CFG path against the XLA scan at guidance 7.5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import seeme_tpu.ops.denoiser_fused as df
from seeme_tpu.core import synthetic_smpl
from seeme_tpu.data import SyntheticEgoDataset
from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem

pytestmark = pytest.mark.slow  # interpret-mode Pallas


def _tiny_system(guidance_scale):
    T, pts = 8, 32
    cfg = SeeMeConfig(
        motion_length=T, scene_points=pts, guidance_scale=guidance_scale,
        num_inference_timesteps=4,
    )
    smpl = synthetic_smpl(n_verts=64)
    data = SyntheticEgoDataset(num_samples=4, motion_length=T,
                               scene_points=pts, seed=0)
    system = SeeMeSystem(cfg, smpl, data.mean, data.std)
    params = system.init_params(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in
             next(data.batches(4, shuffle=False)).items()}
    return system, params, batch


def test_cfg_routes_to_fused_kernel(monkeypatch):
    system, params, batch = _tiny_system(guidance_scale=7.5)
    # encode conditioning BEFORE patching the backend: the scene PointNet
    # Pallas kernel would otherwise try to lower natively on CPU
    cond_full = system.encode_conditioning(params, batch)
    calls = []
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def recorder(p, cond, z0, *a, **k):
        calls.append((cond.shape[0], z0.shape[0], k.get("guidance_scale")))
        return z0

    monkeypatch.setattr(df, "ddim_fused", recorder)
    system.sample_from_cond(params, cond_full, jax.random.PRNGKey(1))
    assert len(calls) == 1
    n_cond_rows, n_z_rows, g = calls[0]
    assert n_cond_rows == 2 * n_z_rows  # doubled [uncond; cond] batch
    assert g == 7.5


def test_fused_cfg_sample_matches_scan():
    """Full sample_from_cond: fused (interpret) vs the XLA scan at
    guidance 7.5 — decode included, so this is the exact test.py surface."""
    system, params, batch = _tiny_system(guidance_scale=7.5)
    cond_full = system.encode_conditioning(params, batch)
    assert cond_full.shape[0] == 2 * batch["feats"].shape[0]

    rng = jax.random.PRNGKey(3)
    feats_scan = system.sample_from_cond(params, cond_full, rng)

    # force the fused route on CPU: patch the backend probe and wrap the
    # kernel in interpret mode (numerics identical to Mosaic up to the
    # documented bf16 envelope)
    orig_backend = jax.default_backend
    orig_fused = df.ddim_fused
    try:
        jax.default_backend = lambda: "tpu"
        df.ddim_fused = lambda *a, **k: orig_fused(*a, **dict(k, interpret=True))
        feats_fused = system.sample_from_cond(params, cond_full, rng)
    finally:
        jax.default_backend = orig_backend
        df.ddim_fused = orig_fused

    scale = float(jnp.abs(feats_scan).max())
    # bf16-resident weights x ~7.5 guidance amplification (kernel tests pin
    # 0.02*scale at guidance 2.5)
    np.testing.assert_allclose(np.asarray(feats_fused),
                               np.asarray(feats_scan), atol=0.06 * scale)
