from .masks import lengths_to_mask
from .rotations import (
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
from .smpl import SmplModel, load_smpl, smpl_forward, synthetic_smpl

__all__ = [
    "aa_to_quat",
    "aa_to_rotmat",
    "quat_to_aa",
    "quat_to_rotmat",
    "rotmat_to_aa",
    "rotmat_to_quat",
    "rot6d_to_rotmat",
    "rotmat_to_rot6d",
    "perspective_projection",
    "lengths_to_mask",
    "SmplModel",
    "load_smpl",
    "smpl_forward",
    "synthetic_smpl",
]
from .ric import qinv, qmul, qrot, recover_from_ric, recover_root_rot_pos
from .rifke import joints_to_rifke, rifke_to_joints
from .rotation2xyz import rot6d_motion_to_joints
