"""Rotation representation conversions (axis-angle / quaternion / rotation matrix /
6-D continuous), pure jnp, arbitrary leading batch dimensions.

Reimplements the semantics of the reference's geometry utilities
(`EgoHMR/utils/geometry.py:5-75`, `mld/utils/geometry2.py`,
`mld/utils/rotation_conversions.py`) as vectorized JAX functions. Two distinct
6-D layouts exist in the reference ("prohmr" column-pairs vs "diffusion"
row-pairs, `EgoHMR/utils/geometry.py:47-66`); both are supported explicitly.

Quaternions are (w, x, y, z), matching the reference convention.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def aa_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> unit quaternion (..., 4), wxyz.

    Mirrors `EgoHMR/utils/geometry.py:5-21`: the angle is the L2 norm of
    (theta + 1e-8) — the epsilon is added *inside* the norm for stability at
    the identity, exactly as the reference does.
    """
    angle = jnp.linalg.norm(aa + _EPS, axis=-1, keepdims=True)
    axis = aa / angle
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalizes then converts quaternion (..., 4) wxyz -> (..., 3, 3)."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3])
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def aa_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues via quat)."""
    return quat_to_rotmat(aa_to_quat(aa))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branchless Shepperd's method: compute all four candidate quaternions and
    select by the largest diagonal-derived magnitude (jit-safe, no data
    dependence in control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is the largest.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5  # |w|, |x|, |y|, |z| for each pivot

    w0, x0, y0, z0 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0)], axis=-1),
            jnp.stack([(m21 - m12) / (4 * x0), x0, (m01 + m10) / (4 * x0), (m02 + m20) / (4 * x0)], axis=-1),
            jnp.stack([(m02 - m20) / (4 * y0), (m01 + m10) / (4 * y0), y0, (m12 + m21) / (4 * y0)], axis=-1),
            jnp.stack([(m10 - m01) / (4 * z0), (m02 + m20) / (4 * z0), (m12 + m21) / (4 * z0), z0], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    pivot = jnp.argmax(jnp.stack([tr, m00, m11, m22], axis=-1), axis=-1)
    quat = jnp.take_along_axis(cand, pivot[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    quat = quat * jnp.where(quat[..., :1] < 0, -1.0, 1.0)
    return quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)


def quat_to_aa(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz -> axis-angle (..., 3)."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w = jnp.clip(quat[..., :1], -1.0, 1.0)
    xyz = quat[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # Stable axis: sin(angle/2) -> 0 means rotation -> identity; use Taylor guard.
    scale = jnp.where(sin_half < 1e-7, 2.0, angle / jnp.maximum(sin_half, 1e-12))
    return xyz * scale


def rotmat_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    return quat_to_aa(rotmat_to_quat(R))


def rot6d_to_rotmat(x: jnp.ndarray, mode: str = "prohmr") -> jnp.ndarray:
    """6-D continuous representation (..., 6) -> rotation matrix (..., 3, 3).

    Gram-Schmidt per Zhou et al. CVPR'19. Two layouts, as in
    `EgoHMR/utils/geometry.py:47-66`:
      * ``prohmr``: the 6 numbers are two rows (a1 a2) read as reshape(2,3)
        then transposed — i.e. column vectors interleaved as rows.
      * ``diffusion``: reshape(3, 2), columns are a1, a2 — this is the layout
        produced by taking the first two *columns* of R
        (`compute_mean_std.py:50-56` / `rotmat_to_rot6d(mode='diffusion')`).
    Output columns are (b1, b2, b1×b2).
    """
    batch = x.shape[:-1]
    if mode == "prohmr":
        m = x.reshape(batch + (2, 3))
        a1, a2 = m[..., 0, :], m[..., 1, :]
    elif mode == "diffusion":
        m = x.reshape(batch + (3, 2))
        a1, a2 = m[..., :, 0], m[..., :, 1]
    else:
        raise ValueError(f"unknown rot6d mode: {mode}")

    def _normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(R: jnp.ndarray, mode: str = "diffusion") -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> 6-D representation (..., 6).

    ``diffusion``: first two columns flattened row-major, matching
    `EgoHMR/utils/geometry.py:69-75`. ``prohmr``: the inverse of the prohmr
    read order (two columns written as two consecutive 3-vectors).
    """
    if mode == "diffusion":
        return R[..., :, :2].reshape(R.shape[:-2] + (6,))
    elif mode == "prohmr":
        cols = jnp.stack([R[..., :, 0], R[..., :, 1]], axis=-2)  # (..., 2, 3)
        return cols.reshape(R.shape[:-2] + (6,))
    raise ValueError(f"unknown rot6d mode: {mode}")


def perspective_projection(
    points: jnp.ndarray,
    translation: jnp.ndarray,
    focal_length: jnp.ndarray,
    camera_center: jnp.ndarray | None = None,
    rotation: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pinhole projection of (B, N, 3) points -> (B, N, 2) pixels.

    Matches `EgoHMR/utils/geometry.py:78-116`: optional camera rotation,
    translation added after rotation, perspective divide, then intrinsics.
    """
    if rotation is not None:
        points = jnp.einsum("bij,bkj->bki", rotation, points)
    points = points + translation[:, None, :]
    projected = points / points[..., 2:3]
    xy = projected[..., :2] * focal_length[:, None, :]
    if camera_center is not None:
        xy = xy + camera_center[:, None, :]
    return xy
