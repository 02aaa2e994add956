"""HumanML3D RIC (rotation-invariant coordinate) feature recovery.

Reimplements `mld/data/humanml/scripts/motion_process.py:362-430`
(`recover_root_rot_pos`, `recover_from_ric`) and the quaternion helpers from
`mld/data/humanml/common/quaternion.py` as vectorized jnp. Feature layout
(263-d for 22 joints / 251-d for 21): [root_rot_vel (1) | root_linear_vel (2)
| root_y (1) | ric (J-1)*3 | rot (J-1)*6 | local_vel J*3 | foot contact (4)].
"""

from __future__ import annotations

import jax.numpy as jnp


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4) wxyz
    (`quaternion.py:54-73`)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2 * (q[..., :1] * uv + uuv)


def recover_root_rot_pos(data: jnp.ndarray):
    """(..., T, D) features -> (root quaternion (..., T, 4), root pos (..., T, 3)).

    The root yaw is the cumulative sum of the per-frame rotation velocity
    (shifted by one), root XZ is the cumulative sum of the yaw-derotated
    linear velocity, root Y comes directly from channel 3
    (`motion_process.py:362-381`).
    """
    rot_vel = data[..., 0]
    r_rot_ang = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1),
        axis=-1,
    )
    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1
    )

    vel_xz = jnp.concatenate(
        [jnp.zeros_like(data[..., :1, 1:3]), data[..., :-1, 1:3]], axis=-2
    )
    r_pos = jnp.stack(
        [vel_xz[..., 0], jnp.zeros_like(vel_xz[..., 0]), vel_xz[..., 1]], axis=-1
    )
    r_pos = qrot(qinv(r_rot_quat), r_pos)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jnp.ndarray, joints_num: int) -> jnp.ndarray:
    """(..., T, D) RIC features -> (..., T, joints_num, 3) joint positions
    (`motion_process.py:415-430`)."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4 : (joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))

    q = jnp.broadcast_to(
        qinv(r_rot_quat)[..., None, :], positions.shape[:-1] + (4,)
    )
    positions = qrot(q, positions)
    positions = positions.at[..., 0].add(r_pos[..., None, 0])
    positions = positions.at[..., 2].add(r_pos[..., None, 2])
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)
