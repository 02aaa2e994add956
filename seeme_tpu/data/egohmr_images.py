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
                 img_size: int = 224):
        self.n_pts = n_pts
        self.img_size = img_size
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

    def _synthetic_split(self, split: str):
        rng = np.random.RandomState({"train": 0, "val": 1, "test": 2}[split])
        examples = [
            synthetic_image_example(rng, self.n_pts, self.img_size)
            for _ in range(self._sizes[split])
        ]
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}

    def batches(self, split: str, batch_size: int, shuffle=None,
                seed: int = 0, augment: bool = False,
                aug_config=None) -> Iterator[Dict[str, np.ndarray]]:
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
        for i in range(0, (n // batch_size) * batch_size, batch_size):
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
