"""Body-scene penetration loss.

The reference penalizes scene points that fall inside the predicted body via
the external COAP neural-occupancy model (`EgoHMR/models/egohmr/egohmr.py:
414-443`: sample scene points in the body bbox, `coap.collision_loss`). COAP
is a learned SMPL occupancy network with its own checkpoints; the shipped
SEE-ME config disables the term (weight 0). The TPU-native equivalent here
replaces the occupancy network with a differentiable capsule approximation of
the body — one capsule per SMPL bone — which is fully static-shape, fuses
into the training step under jit, and needs no extra asset:

    penetration(p) = max_k relu(r_k - dist(p, segment_k))
    loss = sum_p w_bbox(p) * penetration(p)^2 / sum_p w_bbox(p)

The bbox weighting mirrors the reference's in-bbox point sampling
(`egohmr.py:429-436`) without dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .smpl import PARENTS

# Per-bone capsule radii (meters), indexed by the child joint 1..23 of the
# SMPL skeleton; coarse body-part widths (torso thicker than limbs).
DEFAULT_BONE_RADII = np.array([
    0.11, 0.11, 0.09,   # 1 l_hip, 2 r_hip, 3 spine1
    0.07, 0.07, 0.09,   # 4 l_knee, 5 r_knee, 6 spine2
    0.05, 0.05, 0.09,   # 7 l_ankle, 8 r_ankle, 9 spine3
    0.04, 0.04, 0.06,   # 10 l_foot, 11 r_foot, 12 neck
    0.08, 0.08, 0.06,   # 13 l_collar, 14 r_collar, 15 head
    0.05, 0.05,         # 16 l_shoulder, 17 r_shoulder
    0.04, 0.04,         # 18 l_elbow, 19 r_elbow
    0.035, 0.035,       # 20 l_wrist, 21 r_wrist
    0.03, 0.03,         # 22 l_hand, 23 r_hand
], dtype=np.float32)


def point_segment_distance(points: jnp.ndarray, a: jnp.ndarray,
                           b: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) points vs (..., K, 3) segment endpoints -> (..., N, K)."""
    ab = b - a                                        # (..., K, 3)
    ap = points[..., :, None, :] - a[..., None, :, :]  # (..., N, K, 3)
    denom = jnp.sum(ab * ab, axis=-1)[..., None, :] + 1e-9
    t = jnp.clip(jnp.sum(ap * ab[..., None, :, :], axis=-1) / denom, 0.0, 1.0)
    closest = a[..., None, :, :] + t[..., None] * ab[..., None, :, :]
    return jnp.linalg.norm(points[..., :, None, :] - closest, axis=-1)


def scene_collision_loss(
    scene_points: jnp.ndarray,   # (B, N, 3) in the same frame as joints
    joints24: jnp.ndarray,       # (B, 24, 3)
    bone_radii: jnp.ndarray | None = None,
    bbox_pad: float = 0.05,
) -> jnp.ndarray:
    """Mean squared capsule penetration of scene points, per batch -> scalar."""
    radii = jnp.asarray(
        DEFAULT_BONE_RADII if bone_radii is None else bone_radii)
    child = jnp.arange(1, 24)
    parent = jnp.asarray(np.asarray(PARENTS)[1:24])
    a = joints24[:, parent]                          # (B, 23, 3)
    b = joints24[:, child]
    dist = point_segment_distance(scene_points, a, b)  # (B, N, 23)
    penetration = jnp.max(jnp.maximum(radii[None, None, :] - dist, 0.0), axis=-1)

    # in-bbox weighting (`egohmr.py:429-436`), static-shape
    bb_min = joints24.min(axis=1, keepdims=True) - bbox_pad
    bb_max = joints24.max(axis=1, keepdims=True) + bbox_pad
    inside = jnp.all(
        (scene_points >= bb_min) & (scene_points <= bb_max), axis=-1)
    w = inside.astype(penetration.dtype)
    per_item = jnp.sum(w * penetration ** 2, axis=1) / (jnp.sum(w, axis=1) + 1e-6)
    return jnp.mean(per_item)
