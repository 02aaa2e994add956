"""Raw joints -> HumanML3D/KIT RIC feature generation (host-side numpy).

Port of the reference's offline feature pipeline:
  * `mld/data/humanml/scripts/motion_process.py:169-360` (`process_file`,
    `uniform_skeleton`) — raw (T, J, 3) joints to the 263-d (HumanML3D,
    J=22) / 251-d (KIT, J=21) feature vectors stored as `new_joint_vecs`,
  * `mld/data/humanml/common/skeleton.py:4-150` (offsets/IK/FK),
  * `mld/data/humanml/common/quaternion.py` (the numpy helpers used here),
  * `mld/data/humanml/utils/paramUtil.py` (skeleton constants).

This is offline preprocessing — plain numpy on the host, like
`tools/preprocess_egobody.py`. The inverse (features -> joints) lives in
`core/ric.py::recover_from_ric` and the round-trip is property-tested.

Feature layout (`motion_process.py:330-348`):
  [root_rot_vel(1), root_lin_vel_xz(2), root_height(1),
   ric(J-1 * 3), rot6d(J-1 * 6), local_vel(J * 3), feet_contacts(4)]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

# ------------------------------------------------------- skeleton constants
# `paramUtil.py:32-55` (t2m) and :1-30 (kit): unit offset directions per joint
T2M_RAW_OFFSETS = np.array([
    [0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, -1, 0],
    [0, 1, 0], [0, -1, 0], [0, -1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1],
    [0, 1, 0], [1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, -1, 0], [0, -1, 0],
    [0, -1, 0], [0, -1, 0], [0, -1, 0], [0, -1, 0],
], dtype=np.float64)

T2M_KINEMATIC_CHAIN = [
    [0, 2, 5, 8, 11], [0, 1, 4, 7, 10], [0, 3, 6, 9, 12, 15],
    [9, 14, 17, 19, 21], [9, 13, 16, 18, 20],
]

KIT_RAW_OFFSETS = np.array([
    [0, 0, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0], [1, 0, 0],
    [0, -1, 0], [0, -1, 0], [-1, 0, 0], [0, -1, 0], [0, -1, 0], [1, 0, 0],
    [0, -1, 0], [0, -1, 0], [0, 0, 1], [0, 0, 1], [-1, 0, 0], [0, -1, 0],
    [0, -1, 0], [0, 0, 1], [0, 0, 1],
], dtype=np.float64)

KIT_KINEMATIC_CHAIN = [
    [0, 11, 12, 13, 14, 15], [0, 16, 17, 18, 19, 20], [0, 1, 2, 3, 4],
    [3, 5, 6, 7], [3, 8, 9, 10],
]


@dataclass(frozen=True)
class SkeletonSpec:
    """Per-dataset constants (`motion_process.py:435-447, 481-494`)."""

    raw_offsets: np.ndarray
    chains: List[List[int]]
    face_joints: Sequence[int]    # r_hip, l_hip, sdr_r, sdr_l
    fid_l: Sequence[int]
    fid_r: Sequence[int]
    leg_idx: Sequence[int]        # lower-leg joints for the scale ratio
    joints_num: int
    feet_thre: float


HUMANML3D = SkeletonSpec(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN,
                         face_joints=(2, 1, 17, 16), fid_l=(7, 10),
                         fid_r=(8, 11), leg_idx=(5, 8), joints_num=22,
                         feet_thre=0.002)
KIT = SkeletonSpec(KIT_RAW_OFFSETS, KIT_KINEMATIC_CHAIN,
                   face_joints=(11, 16, 5, 8), fid_l=(19, 20),
                   fid_r=(14, 15), leg_idx=(17, 18), joints_num=21,
                   feet_thre=0.05)

SPECS = {"humanml3d": HUMANML3D, "t2m": HUMANML3D, "kit": KIT}


# --------------------------------------------------------- quaternion (w,x,y,z)

def qmul(q: np.ndarray, r: np.ndarray) -> np.ndarray:
    w0, x0, y0, z0 = np.moveaxis(q, -1, 0)
    w1, x1, y1, z1 = np.moveaxis(r, -1, 0)
    return np.stack([
        w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
        w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
        w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
        w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
    ], axis=-1)


def qinv(q: np.ndarray) -> np.ndarray:
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def qrot(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate v by unit quaternion q (broadcasting leading dims)."""
    qvec = q[..., 1:]
    uv = np.cross(qvec, v)
    uuv = np.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qnormalize(q: np.ndarray) -> np.ndarray:
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def qbetween(v0: np.ndarray, v1: np.ndarray) -> np.ndarray:
    """Quaternion rotating v0 onto v1 (`quaternion.py:387-397`)."""
    v = np.cross(v0, v1)
    w = np.sqrt((v0 ** 2).sum(-1, keepdims=True)
                * (v1 ** 2).sum(-1, keepdims=True)) + (v0 * v1).sum(-1, keepdims=True)
    return qnormalize(np.concatenate([w, v], axis=-1))


def qfix(q: np.ndarray) -> np.ndarray:
    """Sign continuity along the time axis (`quaternion.py:149-166`)."""
    assert q.ndim == 3 and q.shape[-1] == 4
    result = q.copy()
    dots = np.sum(q[1:] * q[:-1], axis=2)
    mask = (np.cumsum(dots < 0, axis=0) % 2).astype(bool)
    result[1:][mask] *= -1
    return result


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = np.moveaxis(qnormalize(q), -1, 0)
    m = np.empty(q.shape[:-1] + (3, 3))
    m[..., 0, 0] = 1 - 2 * (y * y + z * z)
    m[..., 0, 1] = 2 * (x * y - w * z)
    m[..., 0, 2] = 2 * (x * z + w * y)
    m[..., 1, 0] = 2 * (x * y + w * z)
    m[..., 1, 1] = 1 - 2 * (x * x + z * z)
    m[..., 1, 2] = 2 * (y * z - w * x)
    m[..., 2, 0] = 2 * (x * z - w * y)
    m[..., 2, 1] = 2 * (y * z + w * x)
    m[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return m


def quat_to_cont6d(q: np.ndarray) -> np.ndarray:
    """First two rotation-matrix columns (`quaternion.py:308-311`)."""
    m = quat_to_rotmat(q)
    return np.concatenate([m[..., 0], m[..., 1]], axis=-1)


# ----------------------------------------------------------------- skeleton

def _parents(chains: List[List[int]], n: int) -> List[int]:
    parents = [0] * n
    parents[0] = -1
    for chain in chains:
        for j in range(1, len(chain)):
            parents[chain[j]] = chain[j - 1]
    return parents


def get_offsets_joints(joints0: np.ndarray, spec: SkeletonSpec) -> np.ndarray:
    """Bone-length-scaled unit offsets from one rest frame
    (`skeleton.py:42-50`)."""
    parents = _parents(spec.chains, spec.joints_num)
    offsets = spec.raw_offsets.copy()
    for i in range(1, spec.joints_num):
        offsets[i] = np.linalg.norm(joints0[i] - joints0[parents[i]]) * offsets[i]
    return offsets


def inverse_kinematics(joints: np.ndarray, spec: SkeletonSpec,
                       smooth_forward: bool = False) -> np.ndarray:
    """(T, J, 3) joints -> (T, J, 4) local quaternions (`skeleton.py:55-103`)."""
    l_hip, r_hip, sdr_r, sdr_l = spec.face_joints
    across = (joints[:, r_hip] - joints[:, l_hip]) + (joints[:, sdr_r] - joints[:, sdr_l])
    across = across / np.sqrt((across ** 2).sum(-1))[:, None]
    forward = np.cross(np.array([[0.0, 1.0, 0.0]]), across, axis=-1)
    if smooth_forward:
        from scipy.ndimage import gaussian_filter1d

        forward = gaussian_filter1d(forward, 20, axis=0, mode="nearest")
    forward = forward / np.sqrt((forward ** 2).sum(-1))[..., None]

    target = np.tile(np.array([[0.0, 0.0, 1.0]]), (len(forward), 1))
    root_quat = qbetween(forward, target)

    quat_params = np.zeros(joints.shape[:-1] + (4,))
    root_quat[0] = np.array([1.0, 0.0, 0.0, 0.0])  # first frame identity
    quat_params[:, 0] = root_quat
    for chain in spec.chains:
        R = root_quat
        for j in range(len(chain) - 1):
            u = np.tile(spec.raw_offsets[chain[j + 1]][None], (len(joints), 1))
            v = joints[:, chain[j + 1]] - joints[:, chain[j]]
            v = v / np.sqrt((v ** 2).sum(-1))[:, None]
            rot_u_v = qbetween(u, v)
            R_loc = qmul(qinv(R), rot_u_v)
            quat_params[:, chain[j + 1]] = R_loc
            R = qmul(R, R_loc)
    return quat_params


def forward_kinematics(quat_params: np.ndarray, root_pos: np.ndarray,
                       offsets: np.ndarray, spec: SkeletonSpec,
                       do_root_R: bool = True) -> np.ndarray:
    """(T, J, 4) local quats + (T, 3) root -> (T, J, 3) joints
    (`skeleton.py:126-148`)."""
    joints = np.zeros(quat_params.shape[:-1] + (3,))
    joints[:, 0] = root_pos
    for chain in spec.chains:
        R = (quat_params[:, 0] if do_root_R
             else np.tile(np.array([[1.0, 0.0, 0.0, 0.0]]), (len(quat_params), 1)))
        for i in range(1, len(chain)):
            R = qmul(R, quat_params[:, chain[i]])
            joints[:, chain[i]] = qrot(R, np.tile(offsets[chain[i]][None],
                                                  (len(quat_params), 1))) \
                + joints[:, chain[i - 1]]
    return joints


def uniform_skeleton(positions: np.ndarray, tgt_offsets: np.ndarray,
                     spec: SkeletonSpec) -> np.ndarray:
    """Retarget to the canonical skeleton (`motion_process.py:13-36`):
    scale root trajectory by the leg-length ratio, IK on the source, FK on
    the target offsets."""
    src_offsets = get_offsets_joints(positions[0], spec)
    l1, l2 = spec.leg_idx
    src_leg_len = np.abs(src_offsets[l1]).max() + np.abs(src_offsets[l2]).max()
    tgt_leg_len = np.abs(tgt_offsets[l1]).max() + np.abs(tgt_offsets[l2]).max()
    scale = tgt_leg_len / src_leg_len
    tgt_root = positions[:, 0] * scale
    quat_params = inverse_kinematics(positions, spec)
    return forward_kinematics(quat_params, tgt_root, tgt_offsets, spec)


# -------------------------------------------------------------- process_file

def process_file(positions: np.ndarray, spec: SkeletonSpec,
                 tgt_offsets: Optional[np.ndarray] = None,
                 feet_thre: Optional[float] = None):
    """(T, J, 3) raw joints -> (T-1, F) feature vectors
    (`motion_process.py:169-360`). Returns
    (data, global_positions, local_positions, l_velocity)."""
    positions = np.asarray(positions, np.float64)[:, : spec.joints_num].copy()
    feet_thre = spec.feet_thre if feet_thre is None else feet_thre

    if tgt_offsets is not None:
        positions = uniform_skeleton(positions, tgt_offsets, spec)

    # floor + origin + initial facing Z+ (`:177-213`)
    positions[:, :, 1] -= positions[..., 1].min()
    root_init = positions[0]
    positions = positions - root_init[0] * np.array([1.0, 0.0, 1.0])
    root_init = positions[0]

    r_hip, l_hip, sdr_r, sdr_l = spec.face_joints
    across = (root_init[r_hip] - root_init[l_hip]) + (root_init[sdr_r] - root_init[sdr_l])
    across = across / np.sqrt((across ** 2).sum(-1))[..., None]
    forward_init = np.cross(np.array([[0.0, 1.0, 0.0]]), across, axis=-1)
    forward_init = forward_init / np.sqrt((forward_init ** 2).sum(-1))[..., None]
    root_quat_init = qbetween(forward_init, np.array([[0.0, 0.0, 1.0]]))
    positions = qrot(np.broadcast_to(root_quat_init,
                                     positions.shape[:-1] + (4,)), positions)

    global_positions = positions.copy()

    # foot contacts: summed squared frame deltas under the threshold
    # (`:229-249`; the threshold compares against the squared sum directly)
    def foot_contacts(idx):
        d2 = ((positions[1:, idx] - positions[:-1, idx]) ** 2).sum(-1)
        return (d2 < feet_thre).astype(np.float64)

    feet_l = foot_contacts(list(spec.fid_l))
    feet_r = foot_contacts(list(spec.fid_r))

    # rot6d params with smoothed forward (`get_cont6d_params`, `:283-304`)
    quat_params = inverse_kinematics(positions, spec, smooth_forward=True)
    cont_6d_params = quat_to_cont6d(quat_params)
    r_rot = quat_params[:, 0].copy()
    velocity = qrot(r_rot[1:], positions[1:, 0] - positions[:-1, 0])
    r_velocity = qmul(r_rot[1:], qinv(r_rot[:-1]))

    # rotation-invariant local positions (`get_rifke`, `:253-259`)
    local_pos = positions.copy()
    local_pos[..., 0] -= local_pos[:, 0:1, 0]
    local_pos[..., 2] -= local_pos[:, 0:1, 2]
    local_pos = qrot(np.repeat(r_rot[:, None], local_pos.shape[1], axis=1),
                     local_pos)

    root_y = local_pos[:, 0, 1:2]
    r_vel_y = np.arcsin(r_velocity[:, 2:3])       # y-axis rotation velocity
    l_velocity = velocity[:, [0, 2]]
    root_data = np.concatenate([r_vel_y, l_velocity, root_y[:-1]], axis=-1)

    rot_data = cont_6d_params[:, 1:].reshape(len(cont_6d_params), -1)
    ric_data = local_pos[:, 1:].reshape(len(local_pos), -1)
    local_vel = qrot(np.repeat(r_rot[:-1, None], global_positions.shape[1], axis=1),
                     global_positions[1:] - global_positions[:-1])
    local_vel = local_vel.reshape(len(local_vel), -1)

    data = np.concatenate([root_data, ric_data[:-1], rot_data[:-1],
                           local_vel, feet_l, feet_r], axis=-1)
    return data, global_positions, local_pos, l_velocity
