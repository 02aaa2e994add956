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


def test_a2m_device_data_epoch_matches_host_batches():
    """The device-resident gather dispatch must train the action branch
    identically to host-sliced batches: the a2m datamodules now expose
    split_arrays/batch_indices (shared epoch_indices generator), so batch
    order — and therefore every step — is bit-comparable."""
    from seeme_tpu.data.registry import SyntheticA2MDataModule
    from seeme_tpu.train import (
        create_train_state,
        make_gather_scan_train_step,
        make_optimizer,
        make_train_step,
        run_epoch,
        run_epoch_device,
    )

    cfg = A2MConfig(nfeats=150, num_frames=16, num_classes=12,
                    num_inference_timesteps=4)
    system = A2MSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0))
    dm = SyntheticA2MDataModule({"DEBUG": True}, num_frames=16)
    opt = make_optimizer("diffusion", params, lr=1e-3)

    state_a = create_train_state(params, opt, jax.random.PRNGKey(7))
    single = make_train_step(system, "diffusion", opt)
    state_a, means_a = run_epoch(
        single, state_a, dm.batches("train", 8, seed=3))

    state_b = create_train_state(params, opt, jax.random.PRNGKey(7))
    gather = make_gather_scan_train_step(system, "diffusion", opt)
    device_data = {k: jnp.asarray(v) for k, v in dm.split_arrays("train").items()}
    state_b, means_b = run_epoch_device(
        gather, state_b, device_data,
        dm.batch_indices("train", 8, seed=3), steps_per_dispatch=4,
    )

    assert int(state_a.step) == int(state_b.step)
    for k in means_a:
        np.testing.assert_allclose(means_a[k], means_b[k], rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        state_a.params,
        state_b.params,
    )


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


def test_uestc_real_loader(tmp_path):
    """Tiny fake VIBE release: subject split, side-2 front-view rotation,
    view-8/side-2 skip, short-train-clip filter, strided 60-frame sampling."""
    import pickle

    from scipy.spatial.transform import Rotation

    from seeme_tpu.data.a2m import UestcDataModule, _y_rotation

    rng = np.random.RandomState(0)
    # (action, view, subject, side, nframes); subject 1 trains, 3 tests
    specs = [
        (0, 1, 1, 1, 120),   # train, long
        (5, 2, 1, 2, 80),    # train, side 2 -> rotated to front view
        (7, 8, 1, 2, 80),    # skipped: view 8 on side 2
        (3, 1, 3, 1, 50),    # test
        (9, 1, 1, 1, 20),    # dropped: train clip under 60*3/4 frames
    ]
    names, poses, joints, cams = [], [], [], []
    for a, v, p, c, T in specs:
        names.append(f"a{a}_d{v}_p{p:03d}_c{c}_color.avi")
        pose = rng.randn(T, 72).astype(np.float32) * 0.2
        if c != 1 and v != 8:
            # global orient that the front-view correction exactly undoes
            inv = Rotation.from_matrix(_y_rotation(v).T).as_rotvec()
            pose[:, :3] = inv.astype(np.float32)
        poses.append(pose)
        joints.append(rng.randn(T, 49, 3).astype(np.float32))
        cam = np.ones((T, 4), np.float32)
        cam[:, 2:] = rng.randn(T, 2).astype(np.float32) * 0.1
        cams.append(cam)
    root = tmp_path / "uestc"
    (root / "info").mkdir(parents=True)
    (root / "info" / "names.txt").write_text("\n".join(names) + "\n")
    (root / "info" / "num_frames_min.txt").write_text(
        "\n".join(str(s[-1]) for s in specs) + "\n")
    (root / "info" / "action_classes.txt").write_text(
        "\n".join(f"class{i}" for i in range(40)) + "\n")
    with open(root / "vibe_cache_refined.pkl", "wb") as f:
        pickle.dump({"pose": poses, "joints3d": joints, "orig_cam": cams}, f)

    dm = UestcDataModule(None, str(root), num_frames=60)
    assert dm.nfeats == 150 and dm.num_classes == 40 and not dm.is_synthetic
    assert dm.num_train == 2                       # long + rotated side-2
    tr = next(dm.batches("train", 2, shuffle=False))
    te = next(dm.batches("test", 1, shuffle=False))
    assert tr["motion"].shape == (2, 60, 150)
    assert set(tr["action"].tolist()) == {0, 5}
    assert te["action"].tolist() == [3] and te["length"][0] == 60

    # the side-2 clip's corrected global orient is the identity rotation
    side2 = tr["motion"][list(tr["action"]).index(5)]
    np.testing.assert_allclose(
        side2[0, :6], np.eye(3)[:, :2].reshape(6), atol=1e-5)
    # root trajectory starts at the origin
    np.testing.assert_allclose(tr["motion"][:, 0, 144:147], 0.0, atol=1e-5)
