"""ProHMR-Scene: scene-conditioned probabilistic human mesh recovery.

Reimplements `EgoHMR/models/prohmr/prohmr_scene.py:16-472` + `smpl_flow.py` +
`fc_head.py` + `discriminator.py` as pure functions over explicit params:

  conditioning = [cam_center/fx (2) | bbox/fx (3) | fx (1) | ResNet50 img
  feats (2048) | PointNet scene feats (512)]  (prepend order of
  `prohmr_scene.py:119-138`), then a ConditionalGlow over 24-joint prohmr-6d
  pose (144-d) plus an FCHead predicting betas/cam offsets from the mean
  params, with mode prediction = flow at z=0 (`forward_step:146-161`).

In SEE-ME only `encode_scene`/`encode_image` are on the hot path
(`mld.py:896-922`); the full model supports the standalone ProHMR branch
(train/eval parity with `test_prohmr_scene.py`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.rotations import rot6d_to_rotmat
from ..core.smpl import SmplModel, smpl_forward
from ..flows.glow import (
    GlowConfig,
    glow_log_prob,
    glow_sample_and_log_prob,
    init_glow,
    initialize_actnorm,
)
from ..nn.pointnet import ResnetPointnet
from ..nn.resnet import resnet50

# SMPL-45 -> OpenPose-25 joint mapping (`prohmr_scene.py:67-68`)
SMPL_TO_OPENPOSE = np.array(
    [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
     25, 26, 27, 28, 29, 30, 31, 32, 33, 34]
)
# 2D joints ignored in the keypoint loss (`prohmr_scene.py:267`)
JOINTS_TO_IGN = np.array([1, 9, 12])


@dataclass(frozen=True)
class ProHMRConfig:
    flow_dim: int = 144
    flow_layers: int = 4
    flow_hidden: int = 1024
    flow_depth: int = 2
    context_features: int = 2048
    scene_feat_dim: int = 512
    with_focal_length: bool = True
    with_bbox_info: bool = True
    with_cam_center: bool = True
    fc_head_features: int = 1024
    image_size: int = 224
    fx_norm_coeff: float = 1500.0
    focal_length: float = 5000.0
    num_train_samples: int = 2
    num_test_samples: int = 4
    smpl_param_noise_ratio: float = 0.005
    loss_weights: Dict[str, float] = field(default_factory=lambda: {
        "V2V_EXP": 0.0, "V2V_MODE": 0.5,
        "KEYPOINTS_3D_EXP": 0.0, "KEYPOINTS_3D_MODE": 0.05,
        "KEYPOINTS_3D_FULL_EXP": 0.0, "KEYPOINTS_3D_FULL_MODE": 0.02,
        "KEYPOINTS_2D_EXP": 0.001, "KEYPOINTS_2D_MODE": 0.01,
        "KEYPOINTS_2D_FULL_EXP": 0.001, "KEYPOINTS_2D_FULL_MODE": 0.01,
        "GLOBAL_ORIENT_EXP": 0.0, "GLOBAL_ORIENT_MODE": 0.001,
        "BODY_POSE_EXP": 0.0, "BODY_POSE_MODE": 0.001,
        "ORTHOGONAL": 0.1, "BETAS_EXP": 0.0, "BETAS_MODE": 0.0005,
        "NLL": 0.001, "ADVERSARIAL": 0.0005,
    })

    @property
    def total_context(self) -> int:
        ctx = self.context_features
        ctx += int(self.with_focal_length) + 3 * int(self.with_bbox_info)
        ctx += 2 * int(self.with_cam_center)
        return ctx + self.scene_feat_dim

    def glow_config(self) -> GlowConfig:
        return GlowConfig(
            features=self.flow_dim,
            hidden_features=self.flow_hidden,
            num_layers=self.flow_layers,
            num_blocks_per_layer=self.flow_depth,
            context_features=self.total_context,
        )


class FCHead(nn.Module):
    """Betas/cam offsets from conditioning features (`fc_head.py:7-52`)."""

    num_features: int = 1024

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.num_features, name="fc1")(feats)
        h = nn.relu(h)
        return nn.Dense(
            13, kernel_init=nn.initializers.xavier_uniform(), name="fc2"
        )(h)  # scaled by gain=0.02 in torch; captured at weight conversion


class Discriminator(nn.Module):
    """HMR pose+shape discriminator -> (B, 25) (`discriminator.py:4-97`)."""

    num_joints: int = 23

    @nn.compact
    def __call__(self, poses: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
        B = poses.shape[0]
        p = poses.reshape(B, self.num_joints, 9)
        p = nn.Dense(32, name="D_conv1")(p)  # 1x1 conv == per-joint dense
        p = nn.relu(p)
        p = nn.Dense(32, name="D_conv2")(p)
        p = nn.relu(p)
        # per-joint scalar heads
        w = self.param("pose_out_w", nn.initializers.xavier_uniform(), (self.num_joints, 32, 1))
        b = self.param("pose_out_b", nn.initializers.zeros, (self.num_joints, 1))
        poses_out = jnp.einsum("bjc,jco->bjo", p, w)[..., 0] + b[None, :, 0]

        h = nn.relu(nn.Dense(10, name="betas_fc1")(betas))
        h = nn.relu(nn.Dense(5, name="betas_fc2")(h))
        betas_out = nn.Dense(1, name="betas_out")(h)

        a = p.reshape(B, -1)
        a = nn.relu(nn.Dense(1024, name="D_alljoints_fc1")(a))
        a = nn.relu(nn.Dense(1024, name="D_alljoints_fc2")(a))
        all_out = nn.Dense(1, name="D_alljoints_out")(a)
        return jnp.concatenate([poses_out, betas_out, all_out], axis=1)


class ProHMRScene:
    """Composed model with pure forward/loss functions."""

    def __init__(self, cfg: ProHMRConfig, smpl: SmplModel,
                 mean_betas: Optional[np.ndarray] = None,
                 mean_cam: Optional[np.ndarray] = None,
                 smpl_male: Optional[SmplModel] = None,
                 smpl_female: Optional[SmplModel] = None):
        self.cfg = cfg
        self.smpl = smpl
        # gendered models for the GT v2v term (`prohmr_scene.py:64-66,
        # 282-289`); fall back to neutral when the assets are absent
        self.smpl_male = smpl_male or smpl
        self.smpl_female = smpl_female or smpl
        self.backbone = resnet50()
        self.scene_enc = ResnetPointnet(out_dim=cfg.scene_feat_dim, hidden_dim=256)
        self.fc_head = FCHead(cfg.fc_head_features)
        self.discriminator = Discriminator()
        self.glow_cfg = cfg.glow_config()
        # smpl_mean_params.npz contract (`fc_head.py:26-31`)
        self.init_betas = jnp.asarray(
            mean_betas if mean_betas is not None else np.zeros(10, np.float32)
        )
        self.init_cam = jnp.asarray(
            mean_cam if mean_cam is not None else np.array([0.9, 0.0, 0.0], np.float32)
        )

    def init_params(self, rng: jax.Array) -> Dict:
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        return {
            "backbone": self.backbone.init(r1, jnp.zeros((1, 224, 224, 3)), train=False),
            "scene_enc": self.scene_enc.init(r2, jnp.zeros((1, 16, 3))),
            "flow": init_glow(r3, self.glow_cfg),
            "fc_head": self.fc_head.init(r4, jnp.zeros((1, self.cfg.total_context))),
            "discriminator": self.discriminator.init(
                r5, jnp.zeros((1, 23, 3, 3)), jnp.zeros((1, 10))
            ),
        }

    # ---------------------------------------------------------------- encoders
    def encode_image(self, params: Dict, img: jnp.ndarray) -> jnp.ndarray:
        return self.backbone.apply(params["backbone"], img, train=False)

    def encode_scene(self, params: Dict, pcd: jnp.ndarray) -> jnp.ndarray:
        if jax.default_backend() != "cpu":
            from ..ops.pointnet_pallas import pointnet_forward_pallas

            return pointnet_forward_pallas(params["scene_enc"], pcd)
        return self.scene_enc.apply(params["scene_enc"], pcd)

    def conditioning_features(self, params: Dict, batch: Dict) -> jnp.ndarray:
        """Assemble the 2566-d context (`forward_step:118-138`)."""
        cfg = self.cfg
        feats = self.encode_image(params, batch["img"])
        if cfg.with_focal_length:
            feats = jnp.concatenate([batch["fx"][:, None], feats], axis=-1)
        if cfg.with_bbox_info:
            orig_fx = batch["fx"] * cfg.fx_norm_coeff
            bbox = jnp.stack(
                [batch["box_center"][:, 0] / orig_fx,
                 batch["box_center"][:, 1] / orig_fx,
                 batch["box_size"] / orig_fx], axis=-1)
            feats = jnp.concatenate([bbox, feats], axis=-1)
        if cfg.with_cam_center:
            orig_fx = batch["fx"] * cfg.fx_norm_coeff
            cam = jnp.stack(
                [batch["cam_cx"] / orig_fx, batch["cam_cy"] / orig_fx], axis=-1)
            feats = jnp.concatenate([cam, feats], axis=-1)
        scene = self.encode_scene(params, batch["scene_pcd"])
        return jnp.concatenate([feats, scene], axis=-1)

    # ------------------------------------------------------------------- flow
    def flow_forward(
        self, params: Dict, context: jnp.ndarray,
        num_samples: Optional[int] = None,
        z: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ):
        """SMPLFlow.forward (`smpl_flow.py:66-120`): sample 6d pose, convert
        to rotmats (prohmr layout), predict betas/cam via FCHead."""
        B = context.shape[0]
        if z is not None:
            num_samples = z.shape[1]
        samples, log_prob, _ = glow_sample_and_log_prob(
            params["flow"], self.glow_cfg, num_samples, context, rng=rng, noise=z
        )
        pred_pose_6d = samples.reshape(B, num_samples, 24, 6)
        rotmats = rot6d_to_rotmat(pred_pose_6d.reshape(-1, 6), mode="prohmr")
        rotmats = rotmats.reshape(B, num_samples, 24, 3, 3)
        offset = self.fc_head.apply(params["fc_head"], context).reshape(B, 1, 13)
        offset = jnp.broadcast_to(offset, (B, num_samples, 13))
        pred_betas = offset[..., :10] + self.init_betas
        pred_cam = offset[..., 10:] + self.init_cam
        return {
            "global_orient": rotmats[:, :, :1],
            "body_pose": rotmats[:, :, 1:],
            "betas": pred_betas,
            "cam": pred_cam,
            "log_prob": log_prob.reshape(B, num_samples),
            "pose_6d": pred_pose_6d.reshape(B, num_samples, -1),
        }

    def flow_log_prob(
        self, params: Dict, pose_6d: jnp.ndarray, context: jnp.ndarray
    ) -> jnp.ndarray:
        """SMPLFlow.log_prob on (B, 144) prohmr-6d poses (`smpl_flow.py:36-63`)."""
        lp, _ = glow_log_prob(params["flow"], self.glow_cfg, pose_6d, context)
        return lp

    def initialize_actnorm(self, params: Dict, pose_6d: jnp.ndarray,
                           context: jnp.ndarray) -> Dict:
        """The ActNorm warmup (`prohmr_scene.py:82-97`), explicit."""
        out = dict(params)
        out["flow"] = initialize_actnorm(params["flow"], self.glow_cfg, pose_6d, context)
        return out

    # ----------------------------------------------------------- forward step
    def forward_step(
        self, params: Dict, batch: Dict, rng: jax.Array, train: bool = False
    ) -> Dict:
        cfg = self.cfg
        num_samples = cfg.num_train_samples if train else cfg.num_test_samples
        context = self.conditioning_features(params, batch)
        B = context.shape[0]

        # mode (z=0) first, then num_samples-1 random draws (`:146-161`)
        z0 = jnp.zeros((B, 1, cfg.flow_dim))
        mode = self.flow_forward(params, context, z=z0)
        out = mode
        if num_samples > 1:
            rnd = self.flow_forward(params, context, num_samples=num_samples - 1, rng=rng)
            out = {
                k: jnp.concatenate([mode[k], rnd[k]], axis=1)
                for k in mode
            }

        # SMPL forward on all samples
        go = out["global_orient"].reshape(B * num_samples, 1, 3, 3)
        bp = out["body_pose"].reshape(B * num_samples, 23, 3, 3)
        betas = out["betas"].reshape(B * num_samples, 10)
        smpl_out = smpl_forward(self.smpl, betas, bp, go, pose2rot=False)
        out["pred_keypoints_3d"] = smpl_out["joints"].reshape(B, num_samples, -1, 3)
        out["pred_vertices"] = smpl_out["vertices"].reshape(B, num_samples, -1, 3)
        out["conditioning_feats"] = context

        # camera translation (`:183-231`)
        cam = out["cam"]
        if cfg.with_focal_length:
            focal = (batch["fx"] * cfg.fx_norm_coeff)[:, None, None]
            focal = jnp.broadcast_to(focal, (B, num_samples, 2))
            cam_center = jnp.stack([batch["cam_cx"], batch["cam_cy"]], axis=-1)[:, None]
            cam_center = jnp.broadcast_to(cam_center, (B, num_samples, 2))
        else:
            focal = jnp.full((B, num_samples, 2), cfg.focal_length)
            cam_center = jnp.broadcast_to(
                jnp.array([960.0, 540.0]), (B, num_samples, 2)
            )
        pred_cam_t = jnp.stack(
            [cam[..., 1], cam[..., 2],
             2 * focal[..., 0] / (cfg.image_size * cam[..., 0] + 1e-9)], axis=-1)
        out["pred_cam_t"] = pred_cam_t

        # full-image camera (convert_pare_to_full_img_cam, `utils/geometry.py:119-131`)
        s, tx, ty = cam[..., 0], cam[..., 1], cam[..., 2]
        bbox_h = batch["box_size"][:, None]
        r = bbox_h / cfg.image_size
        tz = 2 * focal[..., 0] / (r * cfg.image_size * s)
        img_w, img_h = cam_center[..., 0] * 2, cam_center[..., 1] * 2
        cx = 2 * (batch["box_center"][:, None, 0] - img_w / 2) / (s * bbox_h)
        cy = 2 * (batch["box_center"][:, None, 1] - img_h / 2) / (s * bbox_h)
        cam_t_full = jnp.stack([tx + cx, ty + cy, tz], axis=-1)
        out["pred_cam_t_full"] = cam_t_full

        k3d = out["pred_keypoints_3d"]
        out["pred_keypoints_3d_full"] = k3d + cam_t_full[:, :, None, :]

        # projections (flattened over samples)
        NS = num_samples
        k3d_flat = k3d.reshape(B * NS, -1, 3)
        from ..core.rotations import perspective_projection

        k2d_full = perspective_projection(
            k3d_flat, cam_t_full.reshape(B * NS, 3),
            focal.reshape(B * NS, 2), cam_center.reshape(B * NS, 2))
        k2d_full = k2d_full / jnp.array([1920.0, 1080.0]) - 0.5
        out["pred_keypoints_2d_full"] = k2d_full.reshape(B, NS, -1, 2)

        k2d = perspective_projection(
            k3d_flat, pred_cam_t.reshape(B * NS, 3), focal.reshape(B * NS, 2))
        out["pred_keypoints_2d"] = (k2d / cfg.image_size).reshape(B, NS, -1, 2)
        return out

    # ------------------------------------------------------------------ losses
    def compute_loss(
        self, params: Dict, batch: Dict, output: Dict, rng: jax.Array,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, Dict]:
        """`compute_loss` (`prohmr_scene.py:236-406`): mode/expectation
        keypoint + v2v + NLL + 6d-orthogonality + parameter losses."""
        cfg = self.cfg
        W = cfg.loss_weights
        k2d = output["pred_keypoints_2d"][:, :, SMPL_TO_OPENPOSE]
        k2d_full = output["pred_keypoints_2d_full"][:, :, SMPL_TO_OPENPOSE]
        k3d = output["pred_keypoints_3d"][:, :, :24]
        k3d_full = output["pred_keypoints_3d_full"][:, :, :24]
        B, NS = k3d.shape[:2]

        def kp2d_loss(pred, gt):
            conf = gt[..., -1:]
            conf = conf.at[:, :, JOINTS_TO_IGN].set(0.0)
            return jnp.sum(conf * jnp.abs(pred - gt[..., :-1]), axis=(2, 3))

        def kp3d_loss(pred, gt, pelvis_align):
            gt_xyz = gt[..., :3]
            if pelvis_align:
                pred = pred - pred[:, :, :1]
                gt_xyz = gt_xyz - gt_xyz[:, :, :1]
            return jnp.sum(jnp.abs(pred - gt_xyz), axis=(2, 3))

        rep = lambda x: jnp.broadcast_to(x[:, None], (B, NS) + x.shape[1:])
        l_2d = kp2d_loss(k2d, rep(batch["keypoints_2d"]))
        l_2d_full = kp2d_loss(k2d_full, rep(batch["orig_keypoints_2d"]))
        l_3d = kp3d_loss(k3d, rep(batch["keypoints_3d"]), True)
        l_3d_full = kp3d_loss(k3d_full, rep(batch["keypoints_3d_full"]), False)

        # v2v against gendered GT SMPL (`:281-301`): run male + female models
        # and select per sample (gender 1 = female)
        gt_sp = batch["smpl_params"]
        gt_m = smpl_forward(
            self.smpl_male, gt_sp["betas"], gt_sp["body_pose"], gt_sp["global_orient"]
        )
        if self.smpl_female is not self.smpl_male and "gender" in batch:
            gt_f = smpl_forward(
                self.smpl_female, gt_sp["betas"], gt_sp["body_pose"], gt_sp["global_orient"]
            )
            is_f = (batch["gender"] == 1)[:, None, None]
            gt_out = {
                "vertices": jnp.where(is_f, gt_f["vertices"], gt_m["vertices"]),
                "joints": jnp.where(is_f, gt_f["joints"], gt_m["joints"]),
            }
        else:
            gt_out = gt_m
        gt_vertices = gt_out["vertices"]
        gt_pelvis = gt_out["joints"][:, :1]
        pred_pelvis = output["pred_keypoints_3d"][:, :, :1]
        l_v2v = jnp.mean(
            jnp.abs(
                (output["pred_vertices"] - pred_pelvis)
                - (gt_vertices - gt_pelvis)[:, None]
            ),
            axis=(2, 3),
        )

        def mode_exp(l):
            mode = jnp.sum(l[:, 0]) / B
            exp = jnp.sum(l[:, 1:]) / (B * max(NS - 1, 1)) if NS > 1 else 0.0
            return mode, exp

        l2d_m, l2d_e = mode_exp(l_2d)
        l2df_m, l2df_e = mode_exp(l_2d_full)
        l3d_m, l3d_e = mode_exp(l_3d)
        l3df_m, l3df_e = mode_exp(l_3d_full)
        v2v_m = jnp.mean(l_v2v[:, 0])
        v2v_e = jnp.mean(l_v2v[:, 1:]) if NS > 1 else 0.0

        # parameter losses (MSE vs gt rotmats / betas)
        from ..core.rotations import aa_to_rotmat

        gt_go = aa_to_rotmat(gt_sp["global_orient"]).reshape(B, 1, -1)
        gt_bp = aa_to_rotmat(gt_sp["body_pose"].reshape(B, 23, 3)).reshape(B, 1, -1)
        p_go = output["global_orient"].reshape(B, NS, -1)
        p_bp = output["body_pose"].reshape(B, NS, -1)
        p_bt = output["betas"].reshape(B, NS, -1)
        l_go = jnp.sum((p_go - gt_go) ** 2, axis=-1)
        l_bp = jnp.sum((p_bp - gt_bp) ** 2, axis=-1)
        l_bt = jnp.sum((p_bt - gt_sp["betas"][:, None]) ** 2, axis=-1)
        go_m, go_e = mode_exp(l_go)
        bp_m, bp_e = mode_exp(l_bp)
        bt_m, bt_e = mode_exp(l_bt)

        # NLL on (noised) GT prohmr-6d pose (`:348-362`)
        from ..core.rotations import rotmat_to_rot6d

        gt_pose6d = jnp.concatenate(
            [
                rotmat_to_rot6d(aa_to_rotmat(gt_sp["global_orient"]).reshape(B, 1, 3, 3), "prohmr"),
                rotmat_to_rot6d(aa_to_rotmat(gt_sp["body_pose"].reshape(B, 23, 3)), "prohmr"),
            ],
            axis=1,
        ).reshape(B, -1)
        if train:
            rng, nr = jax.random.split(rng)
            gt_pose6d = gt_pose6d + cfg.smpl_param_noise_ratio * jax.random.normal(
                nr, gt_pose6d.shape
            )
        nll = -jnp.mean(
            self.flow_log_prob(params, gt_pose6d, output["conditioning_feats"])
        )

        # 6d orthogonality (`:364-369`)
        p6 = output["pose_6d"].reshape(-1, 2, 3)
        gram = jnp.einsum("bij,bkj->bik", p6, p6)
        ortho = ((gram - jnp.eye(2)) ** 2).reshape(B, NS, -1)
        ortho_m = jnp.mean(ortho[:, 0])
        ortho_e = jnp.mean(ortho[:, 1:]) if NS > 1 else 0.0

        total = (
            W["KEYPOINTS_3D_EXP"] * l3d_e + W["KEYPOINTS_3D_MODE"] * l3d_m
            + W["KEYPOINTS_3D_FULL_EXP"] * l3df_e + W["KEYPOINTS_3D_FULL_MODE"] * l3df_m
            + W["V2V_EXP"] * v2v_e + W["V2V_MODE"] * v2v_m
            + W["KEYPOINTS_2D_EXP"] * l2d_e + W["KEYPOINTS_2D_MODE"] * l2d_m
            + W["KEYPOINTS_2D_FULL_EXP"] * l2df_e + W["KEYPOINTS_2D_FULL_MODE"] * l2df_m
            + W["NLL"] * nll + W["ORTHOGONAL"] * (ortho_e + ortho_m)
            + W["GLOBAL_ORIENT_EXP"] * go_e + W["GLOBAL_ORIENT_MODE"] * go_m
            + W["BODY_POSE_EXP"] * bp_e + W["BODY_POSE_MODE"] * bp_m
            + W["BETAS_EXP"] * bt_e + W["BETAS_MODE"] * bt_m
        )
        terms = {
            "loss": total, "loss_nll": nll,
            "loss_keypoints_3d_mode": l3d_m, "loss_v2v_mode": v2v_m,
            "loss_keypoints_2d_mode": l2d_m, "loss_pose_6d_mode": ortho_m,
        }
        return total, terms

    def discriminator_outputs(self, params: Dict, body_pose: jnp.ndarray,
                              betas: jnp.ndarray) -> jnp.ndarray:
        return self.discriminator.apply(params["discriminator"], body_pose, betas)
