"""Rifke: rotation-invariant joint features (Holden et al.).

Reimplements `mld/transforms/joints2jfeats/rifke.py:11-150` and its helpers
(`joints2jfeats/tools.py`: forward direction from hips+shoulders, soft-min
floor height; `mld/utils/geometry.py:22` matrix_of_angles) in jnp for the
humanml3d 22-joint layout. Feeds the APE/AVE metric family
(`eval/ape_ave.py`).

Feature layout (1 + (J-1)*3 + 1 + 2 dims):
  [root height | root-relative yaw-derotated joint xyz | yaw velocity |
   yaw-derotated root XZ velocity]
"""

from __future__ import annotations

import jax.numpy as jnp

HUMANML3D_JOINTS = [
    "root", "RH", "LH", "BP", "RK", "LK", "BT", "RMrot", "LMrot", "BLN",
    "RF", "LF", "BMN", "RSI", "LSI", "BUN", "RS", "LS", "RE", "LE", "RW", "LW",
]
_J = {name: i for i, name in enumerate(HUMANML3D_JOINTS)}


def _softmin(x, softness=0.5, axis=-1):
    maxi = jnp.max(-x, axis=axis)
    mini = jnp.min(-x, axis=axis)
    return -(maxi + jnp.log(softness + jnp.exp(mini - maxi)))


def get_floor(poses: jnp.ndarray) -> jnp.ndarray:
    """Soft-min height of the feet joints over time (`tools.py:33-46`)."""
    feet = poses[..., (_J["LMrot"], _J["LF"], _J["RMrot"], _J["RF"]), 1]
    foot_heights = jnp.min(feet, axis=-1)  # (..., T)
    return _softmin(foot_heights, softness=0.5, axis=-1)[..., None]


def get_forward_direction(poses: jnp.ndarray) -> jnp.ndarray:
    """Unit 2-vector (XZ) facing direction from hips + shoulders
    (`tools.py:14-30`)."""
    across = (
        poses[..., _J["RH"], :] - poses[..., _J["LH"], :]
        + poses[..., _J["RS"], :] - poses[..., _J["LS"], :]
    )
    forward = jnp.stack([-across[..., 2], across[..., 0]], axis=-1)
    return forward / jnp.maximum(
        jnp.linalg.norm(forward, axis=-1, keepdims=True), 1e-8
    )


def _matrix_of_angles(cos, sin, inv=False):
    sin = -sin if inv else sin
    return jnp.stack(
        [jnp.stack([cos, -sin], axis=-1), jnp.stack([sin, cos], axis=-1)], axis=-2
    )


def joints_to_rifke(joints: jnp.ndarray) -> jnp.ndarray:
    """(..., T, 22, 3) joints -> (..., T, 1+21*3+1+2) features
    (`rifke.py:27-92`)."""
    poses = joints
    poses = poses.at[..., 1].add(-get_floor(poses)[..., None])

    translation = poses[..., 0, :]
    root_y = translation[..., 1]
    trajectory = translation[..., (0, 2)]

    poses = poses[..., 1:, :]
    poses = poses.at[..., (0, 2)].add(-trajectory[..., None, :])

    vel_traj = jnp.diff(trajectory, axis=-2)
    vel_traj = jnp.concatenate([0 * vel_traj[..., :1, :], vel_traj], axis=-2)

    forward = get_forward_direction(poses)
    angles = jnp.arctan2(forward[..., 0], forward[..., 1])
    vel_angles = jnp.diff(angles, axis=-1)
    vel_angles = jnp.concatenate([0 * vel_angles[..., :1], vel_angles], axis=-1)

    sin, cos = forward[..., 0], forward[..., 1]
    rot_inv = _matrix_of_angles(cos, sin, inv=True)

    poses_xz = jnp.einsum("...lj,...jk->...lk", poses[..., (0, 2)], rot_inv)
    poses_local = jnp.stack(
        [poses_xz[..., 0], poses[..., 1], poses_xz[..., 1]], axis=-1
    )
    poses_features = poses_local.reshape(poses_local.shape[:-2] + (-1,))

    vel_traj_local = jnp.einsum("...j,...jk->...k", vel_traj, rot_inv)

    return jnp.concatenate(
        [root_y[..., None], poses_features, vel_angles[..., None], vel_traj_local],
        axis=-1,
    )


def rifke_extract(features: jnp.ndarray):
    """features -> (root_y, poses_features, vel_angles, vel_trajectory_local)."""
    root_y = features[..., 0]
    poses_features = features[..., 1:-3]
    vel_angles = features[..., -3]
    vel_traj_local = features[..., -2:]
    return root_y, poses_features, vel_angles, vel_traj_local


def rifke_to_joints(features: jnp.ndarray) -> jnp.ndarray:
    """Inverse transform (`rifke.py:94-150`)."""
    root_y, poses_features, vel_angles, vel_traj_local = rifke_extract(features)
    angles = jnp.cumsum(vel_angles, axis=-1)
    angles = angles - angles[..., :1]
    rot = _matrix_of_angles(jnp.cos(angles), jnp.sin(angles), inv=False)

    poses_local = poses_features.reshape(poses_features.shape[:-1] + (-1, 3))
    poses_xz = jnp.einsum("...lj,...jk->...lk", poses_local[..., (0, 2)], rot)
    poses = jnp.stack(
        [poses_xz[..., 0], poses_local[..., 1], poses_xz[..., 1]], axis=-1
    )

    vel_traj = jnp.einsum("...j,...jk->...k", vel_traj_local, rot)
    trajectory = jnp.cumsum(vel_traj, axis=-2)
    trajectory = trajectory - trajectory[..., :1, :]

    poses = poses.at[..., (0, 2)].add(trajectory[..., None, :])
    root = jnp.stack(
        [trajectory[..., 0], root_y, trajectory[..., 1]], axis=-1
    )[..., None, :]
    return jnp.concatenate([root, poses], axis=-2)
