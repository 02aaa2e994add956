"""SMPL forward kinematics as one fused, jit-compiled function.

Replaces the external `smplx.SMPL` dependency of the reference (instantiated at
`mld/models/modeltype/mld.py:151-163` and `EgoHMR/models/prohmr/prohmr_scene.py:64-66`)
with a pure-functional TPU implementation:

    batch Rodrigues -> shape blendshapes -> pose blendshapes -> kinematic chain
    (lax.scan over the 24-joint tree levels) -> linear blend skinning -> vertex
    skinning -> extra-joint vertex selection (45 joints total).

Joint contract (must match smplx exactly — SURVEY.md "hard parts" #1):
  * joints[:, :24]  = the 24 posed skeleton joints from the kinematic chain
  * joints[:, 24:45] = 21 extra joints read off mesh vertices at the standard
    smplx vertex ids (nose/eyes/ears/fingertips/toes/heels).
The reference slices `[:, :, :24]` everywhere (`mld.py:737-738, 771-773`), so
the skeleton block is the metrically-relevant part.

All heavy contractions are plain jnp einsum/matmul: XLA maps them onto the MXU
directly. The LBS contraction over 6890 vertices x 24 joints is a single
(B, V, 4, 4) = (V, 24) @ (B, 24, 16) matmul — MXU-shaped by construction.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import aa_to_rotmat

NUM_JOINTS = 24
NUM_BETAS = 10

# Standard SMPL kinematic tree (parent of joint k); joint 0 = pelvis (root).
PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)

# smplx vertex_ids['smplh'] — extra joints appended after the 24 skeleton
# joints, in smplx's iteration order (nose..heels), giving joints 24..44.
EXTRA_JOINT_VERTEX_IDS = np.array(
    [
        332,    # nose
        6260,   # right eye
        2800,   # left eye
        4071,   # right ear
        583,    # left ear
        3216,   # left big toe
        3226,   # left small toe
        3387,   # left heel
        6617,   # right big toe
        6624,   # right small toe
        6787,   # right heel
        2746,   # left thumb
        2319,   # left index
        2445,   # left middle
        2556,   # left ring
        2673,   # left pinky
        6191,   # right thumb
        5782,   # right index
        5905,   # right middle
        6016,   # right ring
        6133,   # right pinky
    ],
    dtype=np.int32,
)


@dataclass(frozen=True)
class SmplModel:
    """Immutable SMPL model tensors (a pytree leaf bundle, donate-safe)."""

    v_template: jnp.ndarray   # (V, 3)
    shapedirs: jnp.ndarray    # (V, 3, n_betas)
    posedirs: jnp.ndarray     # (207, V*3)  — pre-transposed for one matmul
    j_regressor: jnp.ndarray  # (24, V)
    lbs_weights: jnp.ndarray  # (V, 24)
    parents: jnp.ndarray      # (24,) int32
    faces: np.ndarray | None = None          # (F, 3) host-side, rendering only
    extra_joint_ids: jnp.ndarray | None = None  # (21,) vertex ids, or None

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]


def _to_np(x: Any) -> np.ndarray:
    """Convert pickle fields (np arrays, chumpy arrays/stubs, scipy sparse)
    to dense np."""
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray())
    if hasattr(x, "r"):  # real chumpy
        return np.asarray(x.r)
    return np.asarray(x)  # ndarray or _ChumpyStub via __array__


class _ChumpyStub:
    """Unpickles chumpy arrays without chumpy installed: the official SMPL
    pkls store chumpy.ch.Ch objects whose state carries the dense array."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})

    def __array__(self, dtype=None):
        for key in ("x", "v", "a"):
            if key in self.__dict__:
                return np.asarray(self.__dict__[key], dtype=dtype)
        raise ValueError("chumpy stub holds no array payload")


class _SmplUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyStub
        if module == "scipy.sparse.csc" or module == "scipy.sparse._csc":
            import scipy.sparse

            return scipy.sparse.csc_matrix
        return super().find_class(module, name)


def load_smpl(path: str, dtype=jnp.float32) -> SmplModel:
    """Load a standard SMPL model file (.pkl as shipped by MPI, or .npz cache).

    Same file contract as `smplx.SMPL(model_path=...)` in the reference
    (`configs/config_mld_egobody.yaml:125` points at SMPL_NEUTRAL.pkl).
    The pkl path unpickles without chumpy installed (stubbed classes).
    """
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            data = _SmplUnpickler(f, encoding="latin1").load()

    v_template = _to_np(data["v_template"]).astype(np.float32)
    shapedirs = _to_np(data["shapedirs"]).astype(np.float32)[..., :NUM_BETAS]
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    # stored as (V, 3, 207); we want (207, V*3) for a single matmul
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    j_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    lbs_weights = _to_np(data["weights"]).astype(np.float32)
    parents = _to_np(data["kintree_table"])[0].astype(np.int32)
    parents[0] = -1
    faces = _to_np(data.get("f", data.get("faces"))).astype(np.int64) if ("f" in data or "faces" in data) else None

    n_verts = v_template.shape[0]
    extra = EXTRA_JOINT_VERTEX_IDS if n_verts == 6890 else None
    return SmplModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        parents=jnp.asarray(parents),
        faces=faces,
        extra_joint_ids=jnp.asarray(extra) if extra is not None else None,
    )


def synthetic_smpl(n_verts: int = 256, seed: int = 0, dtype=jnp.float32) -> SmplModel:
    """Deterministic synthetic body model with valid SMPL structure.

    For tests and benchmarks when no SMPL_NEUTRAL.pkl is on disk: the kinematic
    tree, shapes, and contractions are identical to the real model, so FK
    correctness properties (identity pose -> template, rigid equivariance)
    and performance characteristics carry over.
    """
    rng = np.random.RandomState(seed)
    v_template = rng.randn(n_verts, 3).astype(np.float32) * 0.3
    shapedirs = rng.randn(n_verts, 3, NUM_BETAS).astype(np.float32) * 0.01
    posedirs = (rng.randn(n_verts, 3, 207).astype(np.float32) * 0.001)
    posedirs = posedirs.reshape(-1, 207).T
    # Joint regressor: rows sum to 1, supported on a few vertices each.
    j_regressor = np.abs(rng.randn(NUM_JOINTS, n_verts).astype(np.float32))
    j_regressor *= rng.rand(NUM_JOINTS, n_verts) < (8.0 / n_verts)
    j_regressor += 1e-4
    j_regressor /= j_regressor.sum(axis=1, keepdims=True)
    # Skinning weights: rows sum to 1.
    lbs = np.abs(rng.randn(n_verts, NUM_JOINTS).astype(np.float32)) ** 4
    lbs /= lbs.sum(axis=1, keepdims=True)
    extra = rng.choice(n_verts, size=21, replace=False).astype(np.int32)
    # A valid (if unaesthetic) triangulation so mesh rendering is exercisable
    # without the real SMPL asset (real faces come from the pkl's 'f' field).
    faces = np.stack(
        [np.arange(n_verts - 2), np.arange(1, n_verts - 1), np.arange(2, n_verts)],
        axis=1,
    ).astype(np.int64)
    return SmplModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(lbs, dtype),
        parents=jnp.asarray(PARENTS),
        faces=faces,
        extra_joint_ids=jnp.asarray(extra),
    )


def _rigid_transforms(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: jnp.ndarray):
    """Compose per-joint world transforms along the kinematic chain.

    rot_mats: (B, 24, 3, 3) local joint rotations; joints: (B, 24, 3) rest
    positions. Returns (posed_joints (B,24,3), rel_transforms (B,24,4,4)).

    The chain walk unrolls over the 24 joints in topological order
    (parents[k] < k holds for SMPL) with STATIC parent indices: the SMPL
    kinematic tree is a fixed constant (PARENTS), identical for every body
    model, so each step is a plain (B,4,4) matmul against an already-built
    parent transform. A lax.scan formulation with a (24, B, 4, 4) carry and
    dynamic indexing forced the scan transpose to checkpoint the WHOLE carry
    per step — O(J^2 B) residual traffic that made the FK backward ~30x its
    forward on TPU (scripts/TRAIN_PROFILE.json round 3); the unrolled chain
    saves one (B,4,4) per joint instead.

    `parents` (the model's own table) is accepted for interface parity but
    the walk uses the canonical PARENTS constant — real SMPL pkls carry the
    same table (kintree_table IS the standard tree). A non-canonical table
    would make rel_pos and the chain walk silently disagree, so concrete
    (non-traced) parents are checked against PARENTS here.
    """
    if not isinstance(parents, jax.core.Tracer):
        if not np.array_equal(np.asarray(parents), PARENTS):
            raise ValueError(
                "smpl._rigid_transforms: parents table differs from the "
                "canonical SMPL PARENTS constant — the chain walk is "
                "specialized to the standard kintree_table and would produce "
                f"inconsistent FK. Got {np.asarray(parents).tolist()}")
    rel_pos = joints - jnp.where(
        (parents >= 0)[None, :, None], joints[:, jnp.clip(parents, 0), :], 0.0
    )

    def make_tf(R, t):  # (B,3,3),(B,3) -> (B,4,4)
        top = jnp.concatenate([R, t[..., None]], axis=-1)
        bot = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bot], axis=-2)

    local_tf = make_tf(rot_mats, rel_pos)  # (B, 24, 4, 4)

    world = [local_tf[:, 0]]
    for k in range(1, NUM_JOINTS):
        world.append(world[int(PARENTS[k])] @ local_tf[:, k])
    world_tf = jnp.stack(world, axis=1)  # (B, 24, 4, 4)

    posed_joints = world_tf[..., :3, 3]
    # Relative-to-rest transforms for skinning: A_k = G_k - pack(G_k @ [j_k, 0])
    joints_h = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    correction = jnp.einsum("bkij,bkj->bki", world_tf, joints_h)  # (B,24,4)
    rel = world_tf.at[..., :, 3].add(-correction)
    return posed_joints, rel


def smpl_joints24(
    model: SmplModel,
    betas: jnp.ndarray,
    body_pose: jnp.ndarray,
    global_orient: jnp.ndarray,
    transl: jnp.ndarray | None = None,
    pose2rot: bool = True,
) -> jnp.ndarray:
    """Fast path: the 24 skeleton joints only, no vertex skinning.

    The reference always runs the full smplx forward (6890-vertex LBS) and
    then slices `joints[:, :, :24]` (`mld.py:737-738, 771-773`) — but those 24
    joints depend only on the regressed rest joints and the kinematic chain,
    never on skinned vertices (pose blendshapes affect vertices only). This
    skips ~99% of the reference's SMPL FLOPs on the training-loss and metric
    paths while producing bit-identical joints[:24].
    """
    B = betas.shape[0]
    if pose2rot:
        aa = jnp.concatenate([global_orient.reshape(B, 1, 3), body_pose.reshape(B, 23, 3)], axis=1)
        rot_mats = aa_to_rotmat(aa)
    else:
        rot_mats = jnp.concatenate(
            [global_orient.reshape(B, 1, 3, 3), body_pose.reshape(B, 23, 3, 3)], axis=1
        )
    # Rest joints: J_regressor @ (template + shapedirs . betas). Fold the
    # regressor through both terms so no (B, V, 3) tensor is materialized.
    j_template = model.j_regressor @ model.v_template                      # (24, 3)
    j_shapedirs = jnp.einsum("jv,vdn->jdn", model.j_regressor, model.shapedirs)
    joints_rest = j_template + jnp.einsum("jdn,bn->bjd", j_shapedirs, betas)
    posed_joints, _ = _rigid_transforms(rot_mats, joints_rest, model.parents)
    if transl is not None:
        posed_joints = posed_joints + transl[:, None, :]
    return posed_joints


def smpl_forward(
    model: SmplModel,
    betas: jnp.ndarray,
    body_pose: jnp.ndarray,
    global_orient: jnp.ndarray,
    transl: jnp.ndarray | None = None,
    pose2rot: bool = True,
    return_vertices: bool = True,
):
    """SMPL forward pass. Mirrors `smplx.SMPL.forward` semantics.

    Args:
      betas: (B, 10) shape coefficients.
      body_pose: (B, 69) axis-angle if pose2rot else (B, 23, 3, 3) rotmats.
      global_orient: (B, 3) axis-angle if pose2rot else (B, 1, 3, 3).
      transl: optional (B, 3) translation added to outputs.
      pose2rot: True for axis-angle inputs (`mld.py:764-770`), False for
        rotation-matrix inputs (`mld.py:720-735`).

    Returns dict with:
      joints:   (B, 45, 3) — 24 skeleton + 21 vertex joints (or 24 if the
                model has no extra_joint_ids).
      vertices: (B, V, 3) if return_vertices.
    """
    B = betas.shape[0]
    if pose2rot:
        aa = jnp.concatenate([global_orient.reshape(B, 1, 3), body_pose.reshape(B, 23, 3)], axis=1)
        rot_mats = aa_to_rotmat(aa)  # (B, 24, 3, 3)
    else:
        rot_mats = jnp.concatenate(
            [global_orient.reshape(B, 1, 3, 3), body_pose.reshape(B, 23, 3, 3)], axis=1
        )

    # Shape blendshapes: v = template + shapedirs . betas   (one MXU matmul)
    v_shaped = model.v_template + jnp.einsum("vdn,bn->bvd", model.shapedirs, betas)
    # Rest joints from shaped vertices.
    joints_rest = jnp.einsum("jv,bvd->bjd", model.j_regressor, v_shaped)

    # Pose blendshapes: feature = vec(R_k - I) for k=1..23 (207 dims).
    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, 207)
    v_posed = v_shaped + (pose_feature @ model.posedirs).reshape(B, -1, 3)

    posed_joints, rel_tf = _rigid_transforms(rot_mats, joints_rest, model.parents)

    if return_vertices or model.extra_joint_ids is not None:
        # LBS: per-vertex 4x4 = lbs_weights (V,24) @ rel_tf (B,24,16)
        vert_tf = jnp.einsum(
            "vk,bkm->bvm", model.lbs_weights, rel_tf.reshape(B, NUM_JOINTS, 16)
        ).reshape(B, -1, 4, 4)
        v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
        vertices = jnp.einsum("bvij,bvj->bvi", vert_tf, v_h)[..., :3]
    else:
        vertices = None

    joints = posed_joints
    if model.extra_joint_ids is not None:
        extra = vertices[:, model.extra_joint_ids]
        joints = jnp.concatenate([joints, extra], axis=1)

    if transl is not None:
        joints = joints + transl[:, None, :]
        if vertices is not None:
            vertices = vertices + transl[:, None, :]

    out = {"joints": joints}
    if return_vertices:
        out["vertices"] = vertices
    return out
