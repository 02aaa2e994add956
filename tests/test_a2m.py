"""Action-to-motion system tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.models.a2m import A2MConfig, A2MSystem


# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


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


def test_feats_to_joints_fk(setup):
    """Sampled rot6d features run through the Rotation2xyz-equivalent FK."""
    from seeme_tpu.core import synthetic_smpl

    _, system, _, _ = setup
    smpl = synthetic_smpl(n_verts=128)
    feats = np.zeros((2, 4, 150), np.float32)
    feats[..., :144] = np.tile(np.eye(3)[:, :2].reshape(6), 24)
    # translation rides in the first 3 slots of the 25th rot6d row
    # (`rotation2xyz.py` unpacks x[:, -1, :3])
    feats[..., 144:147] = [0.5, 0.0, -0.25]
    joints = system.feats_to_joints(smpl, jnp.asarray(feats))
    assert joints.shape == (2, 4, 24, 3)
    # pelvis carries exactly the translation channel
    np.testing.assert_allclose(joints[0, 0, 0], [0.5, 0.0, -0.25], atol=1e-5)


def test_humanact12_real_loader(tmp_path):
    """Real-release pkl -> ACTOR-layout features: rot6d blocks orthonormal,
    root trajectory starts at origin, fixed shapes with true lengths."""
    import pickle

    from seeme_tpu.data.a2m import HumanAct12DataModule

    rng = np.random.RandomState(0)
    clips = {"poses": [], "joints3D": [], "y": []}
    for i, T in enumerate((70, 30, 45)):
        clips["poses"].append(rng.randn(T, 72).astype(np.float32) * 0.3)
        clips["joints3D"].append(rng.randn(T, 24, 3).astype(np.float32))
        clips["y"].append(i % 12)
    pkl_path = tmp_path / "humanact12poses.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(clips, f)

    dm = HumanAct12DataModule(None, str(pkl_path), num_frames=60)
    assert dm.nfeats == 150 and dm.num_classes == 12 and not dm.is_synthetic
    batch = next(dm.batches("train", 3, shuffle=False))
    assert batch["motion"].shape == (3, 60, 150)
    assert sorted(batch["length"].tolist()) == [30, 45, 60]

    # rot6d blocks of valid frames are two orthonormal columns
    L0 = batch["length"][0]
    blocks = batch["motion"][0, :L0, :144].reshape(-1, 24, 3, 2)
    grams = np.einsum("fjik,fjil->fjkl", blocks, blocks)
    np.testing.assert_allclose(grams, np.broadcast_to(np.eye(2), grams.shape),
                               atol=1e-5)
    # trajectory starts at the origin, padded frames zeroed
    np.testing.assert_allclose(batch["motion"][0, 0, 144:147], 0.0, atol=1e-6)
    np.testing.assert_allclose(batch["motion"][1, 31:, :], 0.0)
