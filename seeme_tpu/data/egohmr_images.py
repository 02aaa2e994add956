"""Per-image dataset for the standalone ProHMR / EgoHMR branches.

The reference's `EgoHMR/dataloaders/egobody_dataset.py` yields per-image
examples (224x224 crop, 2D/3D keypoints, SMPL params, camera intrinsics,
scene point cloud — key list at `egobody_dataset.py:303-437`). Here:
a fixed-shape npz loader (produced offline from the release) plus a
synthetic generator so the branch CLIs always run.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator

import numpy as np


def synthetic_image_example(rng, n_pts=1024, img_size=224):
    pose = rng.randn(69).astype(np.float32) * 0.3
    go = rng.randn(3).astype(np.float32) * 0.3
    kp2d = rng.randn(25, 3).astype(np.float32)
    kp2d[:, 2] = (rng.rand(25) > 0.2).astype(np.float32)
    return {
        "img": rng.rand(img_size, img_size, 3).astype(np.float32),
        "scene_pcd": rng.randn(n_pts, 3).astype(np.float32),
        "fx": np.float32(1.0),
        "cam_cx": np.float32(960.0),
        "cam_cy": np.float32(540.0),
        "box_center": (rng.rand(2) * 800).astype(np.float32),
        "box_size": np.float32(200.0 + rng.rand() * 100),
        "keypoints_2d": kp2d,
        "orig_keypoints_2d": kp2d.copy(),
        "keypoints_3d": rng.randn(24, 4).astype(np.float32),
        "keypoints_3d_full": rng.randn(24, 4).astype(np.float32),
        "betas": rng.randn(10).astype(np.float32) * 0.5,
        "body_pose": pose,
        "global_orient": go,
        "transl": rng.randn(3).astype(np.float32),
        "gender": np.int32(rng.randint(0, 2)),
    }


class EgoHmrImageDataModule:
    def __init__(self, cfg=None, root: str | None = None, n_pts: int = 1024,
                 img_size: int = 224, smpl=None):
        """`smpl`: optional SmplModel. When given, synthetic splits are
        *correlated* — keypoints/images/scene are derived from the GT pose by
        FK + projection (the structure the real release has,
        `EgoHMR/dataloaders/egobody_dataset.py:303-437`), so the conditioning
        is actually learnable and trained-vs-random contrasts are meaningful.
        Without it, the legacy uncorrelated draws are kept (shape-level
        tests)."""
        self.n_pts = n_pts
        self.img_size = img_size
        self.smpl = smpl
        proc = os.path.join(root, "processed_images") if root else None
        self.is_synthetic = proc is None or not os.path.isdir(proc)
        if not self.is_synthetic:
            self._splits = {
                s: dict(np.load(os.path.join(proc, f"{s}.npz")))
                for s in ("train", "val", "test")
                if os.path.exists(os.path.join(proc, f"{s}.npz"))
            }
        else:
            self._sizes = {"train": 64, "val": 16, "test": 16}
        self._synth_cache: Dict[str, Dict[str, np.ndarray]] = {}

    def _synthetic_split(self, split: str):
        if split in self._synth_cache:
            return self._synth_cache[split]
        rng = np.random.RandomState({"train": 0, "val": 1, "test": 2}[split])
        if self.smpl is not None:
            data = self._correlated_split(rng, self._sizes[split])
        else:
            examples = [
                synthetic_image_example(rng, self.n_pts, self.img_size)
                for _ in range(self._sizes[split])
            ]
            data = {k: np.stack([e[k] for e in examples]) for k in examples[0]}
        self._synth_cache[split] = data
        return data

    def _correlated_split(self, rng, n: int) -> Dict[str, np.ndarray]:
        """Synthetic examples whose observations are consistent with the GT
        SMPL parameters: keypoints_3d = FK joints, keypoints_2d = pinhole
        projection (OpenPose-25 topology + Bernoulli visibility), the image
        splats the visible 2D joints in crop space (what a renderer would
        put there, learnably), and the scene cloud mixes body-proximal
        points with background — mirroring how real scene geometry
        correlates with pose through contact."""
        import jax.numpy as jnp

        from ..core.smpl import smpl_forward
        from ..models.prohmr import SMPL_TO_OPENPOSE

        S = self.img_size
        body_pose = (rng.randn(n, 69) * 0.3).astype(np.float32)
        global_orient = (rng.randn(n, 3) * 0.3).astype(np.float32)
        betas = (rng.randn(n, 10) * 0.5).astype(np.float32)
        transl = np.stack(
            [rng.randn(n) * 0.3, rng.randn(n) * 0.3, 2.5 + rng.rand(n)],
            axis=-1,
        ).astype(np.float32)
        fx = np.ones(n, np.float32)          # normalized; orig = fx * 1500
        cam_cx = np.full(n, 960.0, np.float32)
        cam_cy = np.full(n, 540.0, np.float32)

        out = smpl_forward(
            self.smpl, jnp.asarray(betas), jnp.asarray(body_pose),
            jnp.asarray(global_orient),
        )
        joints45 = np.asarray(out["joints"], np.float32)        # (n, 45, 3)
        k3d = joints45[:, :24]
        k3d_full = k3d + transl[:, None]

        # pinhole projection of the 45-joint set -> OpenPose-25 topology,
        # normalized to the loss's [-0.5, 0.5] full-image space
        pts = joints45 + transl[:, None]
        focal = (fx * 1500.0)[:, None, None]
        px = focal * pts[..., :2] / pts[..., 2:3] + np.stack(
            [cam_cx, cam_cy], axis=-1)[:, None]
        op_px = px[:, SMPL_TO_OPENPOSE]                          # (n, 25, 2)
        op_norm = op_px / np.array([1920.0, 1080.0], np.float32) - 0.5
        conf = (rng.rand(n, 25) > 0.2).astype(np.float32)
        kp2d = np.concatenate([op_norm, conf[..., None]], axis=-1
                              ).astype(np.float32)

        # crop bbox around the projected joints (+20% margin)
        lo, hi = op_px.min(axis=1), op_px.max(axis=1)
        box_center = ((lo + hi) / 2).astype(np.float32)
        box_size = ((hi - lo).max(axis=-1) * 1.2 + 1e-3).astype(np.float32)

        # image: gaussian splat of each VISIBLE joint at its crop-space
        # position, per-joint deterministic color — a learnable stand-in
        # for the egocentric crop's appearance
        yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
        colors = np.stack([
            (np.arange(25) * 37 % 97) / 97.0,
            (np.arange(25) * 59 % 83) / 83.0,
            (np.arange(25) * 17 % 71) / 71.0,
        ], axis=-1).astype(np.float32)                           # (25, 3)
        sigma = S / 32.0
        imgs = np.zeros((n, S, S, 3), np.float32)
        for i in range(n):
            tl = box_center[i] - box_size[i] / 2
            crop_xy = (op_px[i] - tl) / box_size[i] * S          # (25, 2)
            d2 = ((xx[None] - crop_xy[:, 0, None, None]) ** 2
                  + (yy[None] - crop_xy[:, 1, None, None]) ** 2)
            blob = np.exp(-d2 / (2 * sigma**2)) * conf[i][:, None, None]
            imgs[i] = np.einsum("jhw,jc->hwc", blob, colors).clip(0, 1)

        # scene: half the points hug the posed body (contact structure),
        # half are background clutter around the camera frustum
        n_body = self.n_pts // 2
        sel = rng.randint(0, 24, (n, n_body))
        body_pts = (k3d_full[np.arange(n)[:, None], sel]
                    + rng.randn(n, n_body, 3).astype(np.float32) * 0.05)
        bg = (rng.randn(n, self.n_pts - n_body, 3) * 1.5
              + transl[:, None]).astype(np.float32)
        scene = np.concatenate([body_pts, bg], axis=1).astype(np.float32)

        k3d_c = np.concatenate(
            [k3d, np.ones((n, 24, 1), np.float32)], axis=-1)
        k3d_full_c = np.concatenate(
            [k3d_full, np.ones((n, 24, 1), np.float32)], axis=-1)
        return {
            "img": imgs,
            "scene_pcd": scene,
            "fx": fx,
            "cam_cx": cam_cx,
            "cam_cy": cam_cy,
            "box_center": box_center,
            "box_size": box_size,
            "keypoints_2d": kp2d,
            "orig_keypoints_2d": kp2d.copy(),
            "keypoints_3d": k3d_c,
            "keypoints_3d_full": k3d_full_c,
            "betas": betas,
            "body_pose": body_pose,
            "global_orient": global_orient,
            "transl": transl,
            "gender": rng.randint(0, 2, n).astype(np.int32),
        }

    def batches(self, split: str, batch_size: int, shuffle=None,
                seed: int = 0, augment: bool = False,
                aug_config=None, drop_last: bool = True
                ) -> Iterator[Dict[str, np.ndarray]]:
        """`augment=True` applies the EgoHMR training augmentation pipeline
        (scale/rotate/flip/color — `data/augmentation.py`, the reference
        train-split `do_augment=True` path)."""
        data = (
            self._synthetic_split(split)
            if self.is_synthetic
            else self._splits[split]
        )
        n = len(data["img"])
        idx = np.arange(n)
        if shuffle is None:
            shuffle = split == "train"
        if shuffle:
            np.random.RandomState(seed).shuffle(idx)
        aug_rng = np.random.RandomState(seed + 10_007)
        stop = (n // batch_size) * batch_size if drop_last else n
        for i in range(0, stop, batch_size):
            sel = idx[i : i + batch_size]
            raw = {k: v[sel] for k, v in data.items()}
            if augment:
                from .augmentation import augment_batch

                raw = augment_batch(raw, aug_rng, aug_config)
            yield to_model_batch(raw)


def to_model_batch(raw: Dict) -> Dict:
    """Flat npz keys -> the nested batch the models consume."""
    batch = {k: v for k, v in raw.items()
             if k not in ("betas", "body_pose", "global_orient", "transl", "gender")}
    batch["smpl_params"] = {
        "betas": raw["betas"],
        "body_pose": raw["body_pose"],
        "global_orient": raw["global_orient"],
        "transl": raw["transl"],
    }
    batch["gender"] = raw["gender"]
    return batch
