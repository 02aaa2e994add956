"""SMPL forward-kinematics correctness properties (on the synthetic model —
identical structure/contractions to the real SMPL_NEUTRAL.pkl)."""

import jax
import jax.numpy as jnp
import numpy as np

from seeme_tpu.core import aa_to_rotmat, smpl_forward, synthetic_smpl
from seeme_tpu.core.smpl import PARENTS

MODEL = synthetic_smpl(n_verts=256)


import pytest

# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


def zero_pose(B):
    return dict(
        betas=jnp.zeros((B, 10)),
        body_pose=jnp.zeros((B, 69)),
        global_orient=jnp.zeros((B, 3)),
    )


class TestRestPose:
    def test_identity_pose_returns_template(self):
        out = smpl_forward(MODEL, **zero_pose(2))
        np.testing.assert_allclose(
            out["vertices"], jnp.broadcast_to(MODEL.v_template, (2, 256, 3)), atol=1e-5
        )

    def test_identity_pose_joints_are_regressed_rest_joints(self):
        out = smpl_forward(MODEL, **zero_pose(1))
        rest = jnp.einsum("jv,vd->jd", MODEL.j_regressor, MODEL.v_template)
        np.testing.assert_allclose(out["joints"][0, :24], rest, atol=1e-5)

    def test_joint_count_contract(self):
        out = smpl_forward(MODEL, **zero_pose(3))
        assert out["joints"].shape == (3, 45, 3)  # 24 skeleton + 21 vertex joints
        # extra joints == vertices at the extra ids
        np.testing.assert_allclose(
            out["joints"][:, 24:], out["vertices"][:, MODEL.extra_joint_ids], atol=1e-6
        )


class TestTransforms:
    def test_global_orient_rotates_rigidly(self):
        # Rotating only the root is a rigid transform about the root joint.
        aa = jnp.array([[0.3, -0.2, 0.9]])
        rest = smpl_forward(MODEL, **zero_pose(1))
        out = smpl_forward(
            MODEL,
            betas=jnp.zeros((1, 10)),
            body_pose=jnp.zeros((1, 69)),
            global_orient=aa,
        )
        R = aa_to_rotmat(aa)[0]
        root = rest["joints"][0, 0]
        expect = (rest["vertices"][0] - root) @ R.T + root
        np.testing.assert_allclose(out["vertices"][0], expect, atol=1e-4)

    def test_transl_additive(self):
        t = jnp.array([[1.0, 2.0, 3.0]])
        base = smpl_forward(MODEL, **zero_pose(1))
        moved = smpl_forward(MODEL, **zero_pose(1), transl=t)
        np.testing.assert_allclose(moved["joints"], base["joints"] + t[:, None], atol=1e-5)
        np.testing.assert_allclose(moved["vertices"], base["vertices"] + t[:, None], atol=1e-5)

    def test_pose2rot_false_matches_axis_angle_path(self):
        rng = np.random.RandomState(0)
        body_aa = jnp.asarray(rng.randn(2, 69).astype(np.float32) * 0.3)
        glob_aa = jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.3)
        betas = jnp.asarray(rng.randn(2, 10).astype(np.float32))
        out_aa = smpl_forward(MODEL, betas, body_aa, glob_aa, pose2rot=True)
        out_rm = smpl_forward(
            MODEL,
            betas,
            aa_to_rotmat(body_aa.reshape(2, 23, 3)),
            aa_to_rotmat(glob_aa).reshape(2, 1, 3, 3),
            pose2rot=False,
        )
        np.testing.assert_allclose(out_aa["joints"], out_rm["joints"], atol=1e-4)

    def test_betas_change_shape_not_structure(self):
        out0 = smpl_forward(MODEL, **zero_pose(1))
        out1 = smpl_forward(
            MODEL,
            betas=jnp.ones((1, 10)),
            body_pose=jnp.zeros((1, 69)),
            global_orient=jnp.zeros((1, 3)),
        )
        assert not np.allclose(out0["vertices"], out1["vertices"], atol=1e-3)

    def test_kinematic_chain_locality(self):
        # Rotating a leaf joint (e.g. wrist, joint 22) must not move joints
        # outside its subtree.
        body = np.zeros((1, 69), np.float32)
        body[0, (22 - 1) * 3 : 22 * 3] = [0.0, 1.2, 0.0]
        out = smpl_forward(MODEL, jnp.zeros((1, 10)), jnp.asarray(body), jnp.zeros((1, 3)))
        rest = smpl_forward(MODEL, **zero_pose(1))
        subtree = {22}
        for j in range(24):
            k, chain = j, []
            while k != -1:
                chain.append(k)
                k = int(PARENTS[k])
            if 22 not in chain:
                np.testing.assert_allclose(
                    out["joints"][0, j], rest["joints"][0, j], atol=1e-5,
                    err_msg=f"joint {j} moved but is not in subtree of 22 ({subtree})",
                )


def test_jit_and_grad():
    def loss(body_pose):
        out = smpl_forward(MODEL, jnp.zeros((1, 10)), body_pose, jnp.zeros((1, 3)))
        return jnp.sum(out["joints"] ** 2)

    g = jax.jit(jax.grad(loss))(jnp.full((1, 69), 0.1))
    assert g.shape == (1, 69)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_load_smpl_pkl_without_chumpy(tmp_path):
    """Official SMPL pkls carry chumpy objects; the loader must unpickle
    them with chumpy absent (stubbed classes reading the array payload)."""
    import pickle
    import sys
    import types

    import scipy.sparse as sp

    ch_mod = types.ModuleType("chumpy")
    ch_ch = types.ModuleType("chumpy.ch")

    class Ch:
        def __init__(self, *a):
            pass

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"

    def make_ch(x):
        c = Ch()
        c.__dict__["x"] = x
        return c

    ch_ch.Ch = Ch
    ch_mod.ch = ch_ch
    sys.modules["chumpy"] = ch_mod
    sys.modules["chumpy.ch"] = ch_ch
    try:
        rng = np.random.RandomState(0)
        V = 32
        data = {
            "v_template": make_ch(rng.randn(V, 3)),
            "shapedirs": make_ch(rng.randn(V, 3, 10)),
            "posedirs": rng.randn(V, 3, 207),
            "J_regressor": sp.csc_matrix(np.abs(rng.rand(24, V))),
            "weights": make_ch(np.abs(rng.rand(V, 24))),
            # the canonical SMPL tree (root parent stored as uint32 -1, as in
            # the official pkls) — FK is specialized to this table and rejects
            # non-standard trees (core/smpl.py::_rigid_transforms)
            "kintree_table": np.vstack(
                [
                    np.where(PARENTS < 0, 4294967295, PARENTS).astype(np.int64),
                    np.arange(24),
                ]
            ),
            "f": rng.randint(0, V, (10, 3)),
        }
        path = tmp_path / "fake_smpl.pkl"
        with open(path, "wb") as f:
            pickle.dump(data, f)
    finally:
        del sys.modules["chumpy"], sys.modules["chumpy.ch"]

    from seeme_tpu.core.smpl import load_smpl

    m = load_smpl(str(path))
    assert m.v_template.shape == (32, 3)
    assert m.j_regressor.shape == (24, 32)
    assert int(m.parents[0]) == -1
    # loaded model runs through FK
    out = smpl_forward(m, jnp.zeros((1, 10)), jnp.zeros((1, 69)), jnp.zeros((1, 3)))
    assert out["joints"].shape[1] == 24  # no extra ids for non-6890 models


class TestRotation2xyz:
    """rot6d action-feature FK (`mld/models/operator/rotation2xyz.py`)."""

    def _identity_feats(self, B, T, transl=True):
        # diffusion-layout rot6d of identity: the (3, 2) column block of
        # eye(3) flattened row-major -> [1,0, 0,1, 0,0]
        ident6d = np.tile(np.eye(3)[:, :2].reshape(6), 24)
        F = 24 * 6 + (3 if transl else 0)
        feats = np.zeros((B, T, F), np.float32)
        feats[..., : 24 * 6] = ident6d
        return jnp.asarray(feats)

    def test_identity_pose_matches_rest_joints(self):
        from seeme_tpu.core import rot6d_motion_to_joints, smpl_forward

        feats = self._identity_feats(2, 4)
        joints = rot6d_motion_to_joints(MODEL, feats)
        assert joints.shape == (2, 4, 24, 3)
        rest = smpl_forward(MODEL, **zero_pose(1))["joints"][0, :24]
        rest = rest - rest[:1]
        np.testing.assert_allclose(joints[0, 0], rest, atol=1e-5)

    def test_translation_channel_moves_root(self):
        from seeme_tpu.core import rot6d_motion_to_joints

        feats = self._identity_feats(1, 2)
        feats = feats.at[..., 24 * 6 :].set(jnp.array([1.0, -2.0, 0.5]))
        base = rot6d_motion_to_joints(MODEL, self._identity_feats(1, 2))
        moved = rot6d_motion_to_joints(MODEL, feats)
        np.testing.assert_allclose(moved, base + jnp.array([1.0, -2.0, 0.5]), atol=1e-5)

    def test_keep_global_orient_false_zeroes_root_rotation(self):
        from seeme_tpu.core import rot6d_motion_to_joints
        from seeme_tpu.core.rotations import rotmat_to_rot6d

        rng = np.random.RandomState(3)
        aa = jnp.asarray(rng.randn(1, 1, 3).astype(np.float32))
        R = aa_to_rotmat(aa)  # (1, 1, 3, 3)
        feats = self._identity_feats(1, 1)
        six = rotmat_to_rot6d(R, mode="diffusion").reshape(6)
        feats = feats.at[0, 0, :6].set(six)
        rooted = rot6d_motion_to_joints(MODEL, feats, keep_global_orient=False)
        ident = rot6d_motion_to_joints(MODEL, self._identity_feats(1, 1))
        np.testing.assert_allclose(rooted, ident, atol=1e-4)
