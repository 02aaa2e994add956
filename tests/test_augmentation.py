"""EgoHMR augmentation pipeline tests (host-side numpy)."""

import numpy as np
import pytest

from seeme_tpu.data.augmentation import (
    FLIP_3D_PERM,
    AugmentConfig,
    MoCapDataset,
    augment_batch,
    augment_example,
    fliplr_params,
    gen_trans_from_patch,
    generate_image_patch,
    keypoint_3d_processing,
    rot_aa,
    sample_augmentation,
    scene_verts_3d_processing,
    trans_point2d,
)
from seeme_tpu.data.egohmr_images import synthetic_image_example

NO_AUG = AugmentConfig(scale_factor=0.0, rot_factor=0.0, trans_factor=0.0,
                       color_scale=0.0, rot_aug_rate=0.0, do_flip=False,
                       flip_aug_rate=0.0)


def test_sample_augmentation_statistics():
    """Draw rates match the reference config semantics
    (`configs/__init__.py:24-31`, `do_augmentation` :14-38)."""
    rng = np.random.RandomState(0)
    cfg = AugmentConfig()
    n = 4000
    draws = [sample_augmentation(rng, cfg) for _ in range(n)]
    scales = np.array([d[0] for d in draws])
    rots = np.array([d[1] for d in draws])
    flips = np.array([d[2] for d in draws])
    colors = np.stack([d[3] for d in draws])
    assert abs(flips.mean() - 0.5) < 0.05          # FLIP_AUG_RATE
    assert abs((rots == 0).mean() - 0.4) < 0.05    # 1 - ROT_AUG_RATE
    assert scales.min() >= 0.7 - 1e-9 and scales.max() <= 1.3 + 1e-9
    assert np.abs(rots).max() <= 60.0 + 1e-9       # 2 * ROT_FACTOR clip
    assert colors.min() >= 0.8 and colors.max() <= 1.2


def test_identity_patch_roundtrip():
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32)
    patch, trans = generate_image_patch(img, 16, 16, 32, 32, 32, 32,
                                        do_flip=False, scale=1.0, rot=0.0)
    np.testing.assert_allclose(patch, img, atol=1e-5)
    # identity transform maps points to themselves
    pts = rng.rand(5, 2) * 32
    np.testing.assert_allclose(trans_point2d(pts, trans), pts, atol=1e-5)


def test_affine_matches_bbox_crop():
    """The affine maps the bbox corners onto the patch corners."""
    trans = gen_trans_from_patch(50, 60, 40, 40, 224, 224, scale=1.0, rot=0.0)
    corners = np.array([[30.0, 40.0], [70.0, 80.0]])  # bbox min/max
    out = trans_point2d(corners, trans)
    np.testing.assert_allclose(out, [[0, 0], [224, 224]], atol=1e-4)


def test_fliplr_params_involution():
    rng = np.random.RandomState(2)
    params = {
        "global_orient": rng.randn(3).astype(np.float32),
        "body_pose": rng.randn(69).astype(np.float32),
        "betas": rng.randn(10).astype(np.float32),
        "transl": rng.randn(3).astype(np.float32),
    }
    twice = fliplr_params(fliplr_params(params))
    for k in params:
        np.testing.assert_allclose(twice[k], params[k], atol=1e-6)


def test_rot_aa_composes_rotations():
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(3)
    aa = rng.randn(3) * 0.5
    rot = 37.0
    out = rot_aa(aa, rot)
    rad = np.deg2rad(-rot)
    Rz = Rotation.from_rotvec([0, 0, rad]).as_matrix()
    expect = Rz @ Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(
        Rotation.from_rotvec(out).as_matrix(), expect, atol=1e-6)


def test_keypoint_3d_consistency_with_global_orient():
    """Rotating keypoints with keypoint_3d_processing matches FK of rot_aa'd
    global orient for pelvis-centered joints — the invariant that keeps the
    augmented 3D supervision consistent with the augmented SMPL params."""
    import jax.numpy as jnp

    from seeme_tpu.core.smpl import smpl_joints24, synthetic_smpl

    smpl = synthetic_smpl(n_verts=128)
    rng = np.random.RandomState(4)
    go = rng.randn(3).astype(np.float32) * 0.4
    pose = rng.randn(69).astype(np.float32) * 0.2
    betas = rng.randn(10).astype(np.float32) * 0.3

    def joints(g):
        j = smpl_joints24(smpl, jnp.asarray(betas)[None],
                          jnp.asarray(pose)[None], jnp.asarray(g)[None])
        j = np.asarray(j)[0]
        return j - j[0]  # pelvis-centered

    rot = 25.0
    j_rot_params = joints(rot_aa(go, rot))
    j_rot_kp = keypoint_3d_processing(joints(go), rot, do_flip=False)
    np.testing.assert_allclose(j_rot_params, j_rot_kp, atol=1e-4)


def test_scene_processing_rigid():
    rng = np.random.RandomState(5)
    verts = rng.randn(50, 3).astype(np.float32)
    out = scene_verts_3d_processing(verts, 33.0, do_flip=False)
    # rigid: pairwise distances preserved
    d0 = np.linalg.norm(verts[:10, None] - verts[None, :10], axis=-1)
    d1 = np.linalg.norm(out[:10, None] - out[None, :10], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-4)
    # z preserved (rotation about the camera z axis)
    np.testing.assert_allclose(out[:, 2], verts[:, 2], atol=1e-5)


def test_augment_example_no_aug_is_identity():
    rng = np.random.RandomState(6)
    ex = synthetic_image_example(rng, n_pts=64, img_size=32)
    out = augment_example(ex, np.random.RandomState(0), NO_AUG)
    np.testing.assert_allclose(out["img"], ex["img"], atol=1e-5)
    np.testing.assert_allclose(out["keypoints_2d"][:, :2],
                               ex["keypoints_2d"][:, :2], atol=1e-5)
    # confidence keeps the visibility mask ANDed with the inside-crop test
    # (`augmentation.py:403-407` — the synthetic keypoints include
    # out-of-crop points, whose confidence must drop to 0)
    inside = (np.abs(ex["keypoints_2d"][:, 0]) <= 0.5) & \
             (np.abs(ex["keypoints_2d"][:, 1]) <= 0.5)
    np.testing.assert_allclose(out["keypoints_2d"][:, 2],
                               ex["keypoints_2d"][:, 2] * inside, atol=1e-6)
    np.testing.assert_allclose(out["scene_pcd"], ex["scene_pcd"], atol=1e-5)
    np.testing.assert_allclose(out["global_orient"], ex["global_orient"], atol=1e-6)
    np.testing.assert_allclose(out["body_pose"], ex["body_pose"], atol=1e-6)


def test_augment_batch_shapes_and_variation():
    rng = np.random.RandomState(7)
    exs = [synthetic_image_example(rng, n_pts=64, img_size=32) for _ in range(6)]
    batch = {k: np.stack([e[k] for e in exs]) for k in exs[0]}
    out = augment_batch(batch, np.random.RandomState(1))
    for k, v in batch.items():
        assert out[k].shape == v.shape, k
    # augmentation actually changes the images
    assert np.abs(out["img"] - batch["img"]).mean() > 1e-3


def test_mocap_dataset_synthetic_batches():
    ds = MoCapDataset(None, synthetic_size=40)
    assert ds.is_synthetic and len(ds) == 40
    it = ds.batches(16, np.random.RandomState(0))
    seen = 0
    for batch in it:
        assert batch["body_pose"].shape == (16, 69)
        assert batch["betas"].shape == (16, 10)
        seen += 1
        if seen >= 5:  # endless iterator re-shuffles past one epoch
            break
