"""APE / AVE metric family (TEMOS legacy, `mld/models/metrics/compute.py`
APE_root/APE_traj/APE_pose/APE_joints + AVE_* states, :124-232, 520-543).

APE: summed L2 position error per frame (root / trajectory / local pose /
global joints), normalized by total frame count. AVE: variance error of the
same quantities, normalized per sequence. Quantities come from the Rifke
decomposition (`core/rifke.py`): root = root XYZ trajectory, traj = XZ only,
poses = yaw-derotated root-relative joints.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

import numpy as np

from ..core.rifke import joints_to_rifke, rifke_extract


def _variance(x: np.ndarray, length: int, axis: int = 0) -> np.ndarray:
    """`metrics/utils.py` variance: mean squared deviation over valid frames."""
    x = x[:length]
    return ((x - x.mean(axis=axis, keepdims=True)) ** 2).mean(axis=axis)


def _decompose(joints: np.ndarray):
    """(T, 22, 3) -> (root (T,3), traj (T,2), poses (T,21,3))."""
    import jax.numpy as jnp

    feats = np.asarray(joints_to_rifke(jnp.asarray(joints)))
    root_y, poses_features, _, _ = rifke_extract(feats)
    poses = np.asarray(poses_features).reshape(len(joints), -1, 3)
    traj = joints[:, 0, (0, 2)]
    root = joints[:, 0, :]
    return root, traj, poses


@dataclass
class ApeAveMetrics:
    """Accumulates APE (per-frame) and AVE (per-sequence) sums."""

    sums: Dict[str, float] = field(default_factory=dict)
    count_frames: int = 0
    count_seq: int = 0

    def _add(self, key, value):
        self.sums[key] = self.sums.get(key, 0.0) + float(np.sum(value))

    def update(self, joints_pred: np.ndarray, joints_gt: np.ndarray, lengths) -> None:
        for b in range(len(joints_pred)):
            L = int(lengths[b])
            jp, jg = np.asarray(joints_pred[b][:L]), np.asarray(joints_gt[b][:L])
            root_p, traj_p, poses_p = _decompose(jp)
            root_g, traj_g, poses_g = _decompose(jg)

            self._add("APE_root", np.linalg.norm(root_p - root_g, axis=1))
            self._add("APE_traj", np.linalg.norm(traj_p - traj_g, axis=1))
            self._add("APE_pose", np.linalg.norm(poses_p - poses_g, axis=2).mean(1))
            self._add("APE_joints", np.linalg.norm(jp - jg, axis=2).mean(1))

            self._add("AVE_root", np.linalg.norm(
                _variance(root_p, L) - _variance(root_g, L)))
            self._add("AVE_traj", np.linalg.norm(
                _variance(traj_p, L) - _variance(traj_g, L)))
            self._add("AVE_pose", np.linalg.norm(
                _variance(poses_p, L) - _variance(poses_g, L), axis=1).mean())
            self._add("AVE_joints", np.linalg.norm(
                _variance(jp, L) - _variance(jg, L), axis=1).mean())

            self.count_frames += L
            self.count_seq += 1

    def compute(self) -> Dict[str, float]:
        out = {}
        for k, v in self.sums.items():
            denom = self.count_frames if k.startswith("APE") else self.count_seq
            out[k] = v / max(denom, 1)
        return out
