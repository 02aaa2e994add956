"""rot6d action-motion features -> SMPL joint positions.

TPU-native counterpart of the reference's Rotation2xyz module
(`mld/models/operator/rotation2xyz.py:14-119`), which the action-to-motion
branch uses to turn generated rotation features into renderable / evaluable
joints. The reference supports several pose representations; the shipped
action configs use `rot6d` with 24 joints plus an optional appended root
translation (`configs/base.yaml:89-98`), which is the path implemented here.

Differences from the reference by design:
  * pure function over a `SmplModel` (jit/vmap-friendly), no module state;
  * FK runs through `smpl_joints24`, the no-LBS fast path — action metrics
    only consume the 24 skeleton joints, so the 6890-vertex skinning the
    reference pays for (`rotation2xyz.py:96-104`) is skipped entirely;
  * the reference zeroes the root rotation when `translation=False`
    (`rotation2xyz.py:60-66` glob handling); we keep the same behavior via
    `keep_global_orient`.
"""

from __future__ import annotations

import jax.numpy as jnp

from .rotations import rot6d_to_rotmat
from .smpl import SmplModel, smpl_joints24

__all__ = ["rot6d_motion_to_joints"]


def rot6d_motion_to_joints(
    smpl: SmplModel,
    feats: jnp.ndarray,
    translation: bool = True,
    keep_global_orient: bool = True,
    betas: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """FK for action-motion features.

    feats: (..., T, F) with F = 24*6 (+3 if `translation`): 24 joints of
    diffusion-layout rot6d (first-two-columns convention, `mld.py:100`)
    followed by the root translation channel when present.
    Returns joints (..., T, 24, 3), pelvis-rooted then translated.
    """
    lead = feats.shape[:-1]
    pose6d = feats[..., : 24 * 6].reshape(*lead, 24, 6)
    rotmats = rot6d_to_rotmat(pose6d, mode="diffusion")  # (..., T, 24, 3, 3)
    if not keep_global_orient:
        eye = jnp.broadcast_to(jnp.eye(3), rotmats[..., 0, :, :].shape)
        rotmats = rotmats.at[..., 0, :, :].set(eye)

    flat = rotmats.reshape(-1, 24, 3, 3)
    if betas is None:
        betas_flat = jnp.zeros((flat.shape[0], smpl.shapedirs.shape[-1]))
    else:
        betas_flat = jnp.broadcast_to(
            betas[..., None, :], (*lead, betas.shape[-1])
        ).reshape(flat.shape[0], -1)
    joints = smpl_joints24(
        smpl, betas_flat, flat[:, 1:], flat[:, :1], pose2rot=False
    ).reshape(*lead, 24, 3)

    # root at pelvis, as the reference does before adding the trajectory
    # (`rotation2xyz.py:106-116`)
    joints = joints - joints[..., :1, :]
    if translation and feats.shape[-1] >= 24 * 6 + 3:
        joints = joints + feats[..., 24 * 6 : 24 * 6 + 3][..., None, :]
    return joints
