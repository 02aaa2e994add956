"""Property tests for rotation conversions, mirroring the invertibility-style
test pattern of the reference's nflows suite (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.core import (
    aa_to_quat,
    aa_to_rotmat,
    perspective_projection,
    quat_to_aa,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_aa,
    rotmat_to_quat,
    rotmat_to_rot6d,
)


def random_aa(n, seed=0, scale=2.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(n, 3).astype(np.float32) * scale)


def assert_rotation_matrix(R, atol=1e-5):
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=atol)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=atol)


class TestAxisAngle:
    def test_aa_rotmat_roundtrip(self):
        aa = random_aa(64)
        R = aa_to_rotmat(aa)
        assert_rotation_matrix(R)
        aa2 = rotmat_to_aa(R)
        # axis-angle is multi-valued; compare rotation matrices instead
        np.testing.assert_allclose(aa_to_rotmat(aa2), R, atol=1e-5)

    def test_identity(self):
        R = aa_to_rotmat(jnp.zeros((4, 3)))
        np.testing.assert_allclose(R, jnp.broadcast_to(jnp.eye(3), (4, 3, 3)), atol=1e-5)

    def test_known_rotation(self):
        # pi/2 around z maps x->y
        aa = jnp.array([[0.0, 0.0, np.pi / 2]])
        R = aa_to_rotmat(aa)
        np.testing.assert_allclose(R[0] @ jnp.array([1.0, 0, 0]), jnp.array([0, 1.0, 0]), atol=1e-6)

    def test_batch_dims(self):
        aa = random_aa(24).reshape(2, 3, 4, 3)
        assert aa_to_rotmat(aa).shape == (2, 3, 4, 3, 3)


class TestQuaternion:
    def test_quat_roundtrip(self):
        aa = random_aa(64, seed=1)
        q = aa_to_quat(aa)
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
        R = quat_to_rotmat(q)
        q2 = rotmat_to_quat(R)
        # q and -q are the same rotation; rotmat_to_quat canonicalizes w>=0
        sign = jnp.sign(q[..., :1])
        np.testing.assert_allclose(q * sign, q2, atol=1e-4)

    def test_quat_aa_roundtrip(self):
        aa = random_aa(64, seed=2, scale=1.5)
        aa2 = quat_to_aa(aa_to_quat(aa))
        np.testing.assert_allclose(aa_to_rotmat(aa2), aa_to_rotmat(aa), atol=1e-5)

    def test_near_identity_rotmat_to_quat(self):
        aa = random_aa(16, seed=3, scale=1e-4)
        R = aa_to_rotmat(aa)
        q = rotmat_to_quat(R)
        np.testing.assert_allclose(quat_to_rotmat(q), R, atol=1e-5)


class TestRot6d:
    @pytest.mark.parametrize("mode", ["prohmr", "diffusion"])
    def test_produces_rotations(self, mode):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(32, 6).astype(np.float32))
        R = rot6d_to_rotmat(x, mode=mode)
        assert_rotation_matrix(R, atol=1e-4)

    @pytest.mark.parametrize("mode", ["prohmr", "diffusion"])
    def test_roundtrip_from_rotation(self, mode):
        R = aa_to_rotmat(random_aa(32, seed=4))
        x = rotmat_to_rot6d(R, mode=mode)
        np.testing.assert_allclose(rot6d_to_rotmat(x, mode=mode), R, atol=1e-4)

    def test_modes_differ_on_same_input(self):
        # The two reference layouts are NOT interchangeable
        # (EgoHMR/utils/geometry.py:56-60); guard against conflating them.
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(8, 6).astype(np.float32))
        Rp = rot6d_to_rotmat(x, mode="prohmr")
        Rd = rot6d_to_rotmat(x, mode="diffusion")
        assert not np.allclose(Rp, Rd, atol=1e-3)

    def test_diffusion_layout_is_first_two_columns(self):
        R = aa_to_rotmat(random_aa(8, seed=6))
        x = rotmat_to_rot6d(R, mode="diffusion")
        np.testing.assert_allclose(x.reshape(8, 3, 2), R[..., :, :2], atol=1e-6)


class TestProjection:
    def test_center_point(self):
        pts = jnp.zeros((2, 5, 3))
        transl = jnp.tile(jnp.array([[0.0, 0.0, 5.0]]), (2, 1))
        f = jnp.full((2, 2), 1000.0)
        c = jnp.tile(jnp.array([[320.0, 240.0]]), (2, 1))
        xy = perspective_projection(pts, transl, f, c)
        np.testing.assert_allclose(xy, jnp.broadcast_to(c[:, None, :], (2, 5, 2)), atol=1e-4)

    def test_rotation_applied_before_translation(self):
        pts = jnp.array([[[1.0, 0.0, 0.0]]])
        Rz = aa_to_rotmat(jnp.array([[0.0, 0.0, np.pi / 2]]))  # x -> y
        transl = jnp.array([[0.0, 0.0, 2.0]])
        f = jnp.ones((1, 2))
        xy = perspective_projection(pts, transl, f, rotation=Rz)
        np.testing.assert_allclose(xy[0, 0], jnp.array([0.0, 0.5]), atol=1e-6)


def test_jit_compatible():
    fn = jax.jit(lambda aa: rotmat_to_aa(aa_to_rotmat(aa)))
    aa = random_aa(8, seed=7)
    np.testing.assert_allclose(aa_to_rotmat(fn(aa)), aa_to_rotmat(aa), atol=1e-5)
