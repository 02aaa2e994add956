"""Synthetic EgoBody/GIMO-shaped data.

Serves the role of the reference's DEBUG tiny-dataset mode
(`dataset.py:1148-1152`: truncate to 10 samples) but with generated data, so
end-to-end training/eval/benchmarks run in environments without the EgoBody
release. Motions are smooth pose-space random walks with the interactee
correlated to the wearer (so the conditioning signal is learnable).
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


class SyntheticEgoDataset:
    """Deterministic generated dataset with the EgoBody batch contract."""

    def __init__(
        self,
        num_samples: int = 64,
        motion_length: int = 60,
        pose_feats: int = 72,
        scene_points: int = 1024,
        with_scene: bool = True,
        with_image: bool = False,
        image_size: int = 224,
        seed: int = 0,
    ):
        self.num_samples = num_samples
        self.motion_length = motion_length
        self.pose_feats = pose_feats
        self.scene_points = scene_points
        self.with_scene = with_scene
        self.with_image = with_image
        rng = np.random.RandomState(seed)
        T, P = motion_length, pose_feats

        def smooth_walk(shape, scale):
            steps = rng.randn(*shape).astype(np.float32) * scale
            x = np.cumsum(steps, axis=1)
            # light smoothing for plausible acceleration statistics
            k = np.array([0.25, 0.5, 0.25], np.float32)
            return np.apply_along_axis(lambda v: np.convolve(v, k, mode="same"), 1, x)

        wearer = smooth_walk((num_samples, T, P), 0.05)
        # interactee = mirrored wearer + noise: a learnable conditioning signal
        interactee = -0.8 * wearer + smooth_walk((num_samples, T, P), 0.03)
        self.feats = np.stack([wearer, interactee], axis=2)  # (N, T, 2, P)
        self.transl = smooth_walk((num_samples, 2 * T, 3), 0.02).reshape(
            num_samples, 2, T, 3
        )
        self.betas = np.repeat(
            rng.randn(num_samples, 2, 1, 10).astype(np.float32) * 0.5, T, axis=2
        )
        self.cam = np.abs(rng.randn(num_samples, T, 6).astype(np.float32))
        if with_scene:
            self.scene = rng.randn(num_samples, scene_points, 3).astype(np.float32)
        if with_image:
            # weakly informative image (like a real egocentric crop): a
            # fixed random projection of the wearer's mean pose drives
            # horizontal color stripes + noise, so the frozen-ResNet
            # image-conditioning path has an actually learnable signal
            proj = rng.randn(P, 3 * 8).astype(np.float32) * 0.5
            code = np.tanh(wearer.mean(axis=1) @ proj)        # (N, 24)
            stripes = np.repeat(
                code.reshape(num_samples, 8, 1, 3),
                image_size // 8 + 1, axis=1)[:, :image_size]  # (N, H, 1, 3)
            self.image = (
                0.5 + 0.35 * stripes
                + 0.1 * rng.rand(num_samples, image_size, image_size, 3)
            ).clip(0, 1).astype(np.float32)
        self.length = np.full((num_samples,), T, np.int32)
        # precomputed per-sample features (e.g. frozen scene embeddings)
        # attached by the train loop; sliced into every batch
        self.extras: Dict[str, np.ndarray] = {}

        # normalization stats over the (pose + transl) feature vector,
        # same contract as mean.npy/std.npy (`mld/data/EgoBody.py:124-131`)
        flat = np.concatenate(
            [self.feats[:, :, 0, :], self.transl[:, 0]], axis=-1
        ).reshape(-1, P + 3)
        self.mean = flat.mean(0)
        self.std = flat.std(0) + 1e-6

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        out = {
            "feats": self.feats[idx],
            "transl": self.transl[idx],
            "betas": self.betas[idx],
            "cam": self.cam[idx],
            "length": self.length[idx],
        }
        if self.with_scene:
            out["scene"] = self.scene[idx]
        if self.with_image:
            out["image"] = self.image[idx]
        return out

    def split_arrays(self) -> Dict[str, np.ndarray]:
        """All per-sample arrays (row i <-> sample i), incl. attached extras,
        for the device-resident gather path."""
        out = {
            "feats": self.feats,
            "transl": self.transl,
            "betas": self.betas,
            "cam": self.cam,
            "length": self.length,
        }
        if self.with_scene:
            out["scene"] = self.scene
        if self.with_image:
            out["image"] = self.image
        out.update(self.extras)
        return out

    def batch_indices(
        self, batch_size: int, shuffle: bool = True, seed: int = 0,
        drop_last: bool = True,
    ):
        from .batch import epoch_indices

        return epoch_indices(self.num_samples, batch_size, shuffle=shuffle,
                             seed=seed, drop_last=drop_last)

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0, drop_last: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        for sel in self.batch_indices(batch_size, shuffle=shuffle, seed=seed,
                                      drop_last=drop_last):
            batch = {
                "feats": self.feats[sel],
                "transl": self.transl[sel],
                "betas": self.betas[sel],
                "cam": self.cam[sel],
                "length": self.length[sel],
            }
            if self.with_scene and "scene_feats" not in self.extras:
                # cached frozen scene features supersede the raw cloud
                batch["scene"] = self.scene[sel]
            if self.with_image and "image_feats" not in self.extras:
                # same for cached frozen ResNet50 image features
                batch["image"] = self.image[sel]
            for k, v in self.extras.items():
                batch[k] = v[sel]
            yield batch
