"""Capsule scene-collision loss tests (core/collision.py — the native
equivalent of the reference's COAP penetration term, `egohmr.py:414-443`)."""

import jax
import jax.numpy as jnp
import numpy as np

from seeme_tpu.core.collision import (
    point_segment_distance,
    scene_collision_loss,
)
from seeme_tpu.core.smpl import smpl_joints24, synthetic_smpl


def test_point_segment_distance_basics():
    a = jnp.array([[[0.0, 0.0, 0.0]]])
    b = jnp.array([[[1.0, 0.0, 0.0]]])
    pts = jnp.array([[[0.5, 1.0, 0.0],    # above the middle
                      [2.0, 0.0, 0.0],    # beyond the end
                      [0.25, 0.0, 0.0]]])  # on the segment
    d = point_segment_distance(pts, a, b)[0, :, 0]
    np.testing.assert_allclose(np.asarray(d), [1.0, 1.0, 0.0], atol=1e-6)


def _standing_joints(B=2):
    smpl = synthetic_smpl(n_verts=64)
    betas = jnp.zeros((B, 10))
    pose = jnp.zeros((B, 69))
    go = jnp.zeros((B, 3))
    return smpl_joints24(smpl, betas, pose, go)


def test_zero_when_scene_far_away():
    joints = _standing_joints()
    far = jnp.full((2, 100, 3), 10.0)
    loss = scene_collision_loss(far, joints)
    assert float(loss) == 0.0


def test_positive_when_points_inside_body():
    joints = _standing_joints()
    # points ON the bone segments penetrate by the full radius
    mid = (joints[:, 1:] + joints[:, [0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9,
                                      9, 12, 13, 14, 16, 17, 18, 19, 20, 21]]) / 2
    loss_inside = scene_collision_loss(mid, joints)
    assert float(loss_inside) > 1e-4
    # and shrinks as points move away from the body
    loss_off = scene_collision_loss(mid + 0.5, joints)
    assert float(loss_off) < float(loss_inside)


def test_differentiable_and_jittable():
    joints = _standing_joints()
    pts = joints[:, :1] + 0.01  # near the pelvis

    def f(j):
        return scene_collision_loss(pts, j)

    g = jax.jit(jax.grad(f))(joints)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0  # pushes the body away
