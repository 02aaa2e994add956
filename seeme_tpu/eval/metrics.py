"""Ego evaluation metrics, vectorized.

Reimplements `mld/models/metrics/compute.py:87-684` (ComputeMetrics /
'EgoMetric'). The reference loops per sequence in Python with numpy
(`compute.py:441-517`) — here the per-sequence math is one jitted batch
computation; only the accumulate-and-filter bookkeeping stays host-side.

Semantics preserved exactly:
  * start alignment: subtract the frame-0 head-joint (15) position from both
    trajectories (`compute.py:365-373`),
  * pelvis trajectories taken AFTER start alignment, then per-frame pelvis
    (root) alignment of the joints (`compute.py:382-399`),
  * MPJPE: mean joint L2 after root alignment, x1000 (mm) (`compute.py:472-473`),
  * ROOT_ERROR: mean pelvis L2, x1000 (`compute.py:471`),
  * HEAD_ORIENTATION_ERROR: mean_t ||I - R_gt R_pred^{-1}||_F on the
    global-orientation rotations (`compute.py:338-346, 470`),
  * ACCL: mean ||d2(gt) - d2(pred)||, x1000 (`compute.py:243-271, 474`),
  * interactee MPJPE: root-aligned, always accumulated (`compute.py:476-481`),
  * test-split filter: a sequence counts only when head_err < 0.9 and
    root_err < 300 and mean accel > 0 (`compute.py:489-517`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rotations import quat_to_rotmat

HEAD_JOINT = 15
PELVIS = 0


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis) -> jnp.ndarray:
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask, axis=axis) / jnp.maximum(jnp.sum(mask, axis=axis), 1.0)


@jax.jit
def ego_sequence_metrics(
    jts_pred: jnp.ndarray,   # (B, T, 24, 3)
    jts_gt: jnp.ndarray,     # (B, T, 24, 3)
    quat_pred: jnp.ndarray,  # (B, T, 4) wxyz global orientation
    quat_gt: jnp.ndarray,    # (B, T, 4)
    mask: jnp.ndarray,       # (B, T) True = valid frame
) -> Dict[str, jnp.ndarray]:
    """Per-sequence metric values, each (B,)."""
    # start alignment on head joint at frame 0
    jts_gt = jts_gt - jts_gt[:, 0:1, HEAD_JOINT : HEAD_JOINT + 1]
    jts_pred = jts_pred - jts_pred[:, 0:1, HEAD_JOINT : HEAD_JOINT + 1]

    pelvis_gt = jts_gt[:, :, PELVIS]
    pelvis_pred = jts_pred[:, :, PELVIS]

    # root (pelvis) alignment
    jts_gt_a = jts_gt - jts_gt[:, :, PELVIS : PELVIS + 1]
    jts_pred_a = jts_pred - jts_pred[:, :, PELVIS : PELVIS + 1]

    # MPJPE: mean over (frames x joints) of L2, masked frames, mm.
    # NOTE the reference averages over frames and joints jointly
    # (`np.linalg.norm(...).mean()`, compute.py:472), not per-frame-then-mean;
    # with a frame mask those coincide because every joint row weighs equally.
    err = jnp.linalg.norm(jts_pred_a - jts_gt_a, axis=-1)       # (B, T, 24)
    mpjpe = _masked_mean(jnp.mean(err, axis=-1), mask, axis=1) * 1000.0

    root_err = _masked_mean(
        jnp.linalg.norm(pelvis_gt - pelvis_pred, axis=-1), mask, axis=1
    ) * 1000.0

    # head-orientation Frobenius error; R^{-1} = R^T for rotations
    R_gt = quat_to_rotmat(quat_gt)
    R_pred = quat_to_rotmat(quat_pred)
    eye = jnp.eye(3)
    frob = jnp.linalg.norm(
        eye - jnp.einsum("btij,btkj->btik", R_gt, R_pred), axis=(-2, -1)
    )
    head_err = _masked_mean(frob, mask, axis=1)

    # acceleration error over second differences (compute_error_accel)
    accel_gt = jts_gt[:, :-2] - 2 * jts_gt[:, 1:-1] + jts_gt[:, 2:]
    accel_pred = jts_pred[:, :-2] - 2 * jts_pred[:, 1:-1] + jts_pred[:, 2:]
    accel_normed = jnp.mean(
        jnp.linalg.norm(accel_pred - accel_gt, axis=-1), axis=-1
    )  # (B, T-2)
    accel_mask = mask[:, :-2] & mask[:, 1:-1] & mask[:, 2:]
    accl = _masked_mean(accel_normed, accel_mask, axis=1) * 1000.0

    return {
        "mpjpe": mpjpe,
        "root_err": root_err,
        "head_err": head_err,
        "accl": accl,
    }


@jax.jit
def interactee_mpjpe(
    jts_int: jnp.ndarray, jts_int_gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    a = jts_int - jts_int[:, :, PELVIS : PELVIS + 1]
    b = jts_int_gt - jts_int_gt[:, :, PELVIS : PELVIS + 1]
    err = jnp.mean(jnp.linalg.norm(a - b, axis=-1), axis=-1)
    return _masked_mean(err, mask, axis=1) * 1000.0


@dataclass
class EgoMetric:
    """Accumulating metric with the reference's filtered-sum semantics."""

    split: str = "test"
    sums: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    def _add(self, key: str, value: float) -> None:
        self.sums[key] = self.sums.get(key, 0.0) + float(value)
        self.counts[key] = self.counts.get(key, 0) + 1

    def update(
        self,
        jts_pred,
        jts_gt,
        quat_pred,
        quat_gt,
        mask,
        jts_int: Optional[jnp.ndarray] = None,
        jts_int_gt: Optional[jnp.ndarray] = None,
    ) -> None:
        per_seq = {k: np.asarray(v) for k, v in ego_sequence_metrics(
            jts_pred, jts_gt, quat_pred, quat_gt, mask
        ).items()}
        if jts_int is not None and jts_int_gt is not None:
            mpjpe_int = np.asarray(interactee_mpjpe(jts_int, jts_int_gt, mask))
            for v in mpjpe_int:
                self._add("mpjpe_interactee", v)

        B = per_seq["mpjpe"].shape[0]
        for b in range(B):
            keep = (
                self.split != "test"
                or (
                    per_seq["head_err"][b] < 0.9
                    and per_seq["root_err"][b] < 300.0
                    and per_seq["accl"][b] > 0.0
                )
            )
            if keep:
                self._add("MPJPE", per_seq["mpjpe"][b])
                self._add("ROOT_ERROR", per_seq["root_err"][b])
                self._add("HEAD_ORIENTATION_ERROR", per_seq["head_err"][b])
                self._add("ACCL", per_seq["accl"][b])

    def compute(self, sync: bool = False) -> Dict[str, float]:
        """Means over accumulated sequences; sync=True all-reduces the
        (sum, count) pairs across hosts first (multi-host eval)."""
        sums, counts = self.sums, self.counts
        if sync:
            from ..parallel import allreduce_metric_sums

            sums, counts = allreduce_metric_sums(sums, counts)
        return {k: sums[k] / max(counts[k], 1) for k in sums}

    def reset(self) -> None:
        self.sums.clear()
        self.counts.clear()
