"""Action-to-motion datamodules over the real releases.

HumanAct12: loads the standard `humanact12poses.pkl` release
(`mld/data/a2m/humanact12poses.py:14-47`: per-clip axis-angle poses (T, 72),
joints3D (T, 24, 3), labels y) and produces the ACTOR-convention motion
features the A2M system consumes: 24 joints of diffusion-layout rot6d (144)
+ root trajectory (3) padded to the 25x6 block layout (150), fixed
NUM_FRAMES with zero padding and true lengths — replacing the reference's
per-item crop/collate work with fixed shapes.

UESTC's release is a video corpus with per-video preprocessed rotation pkls
(`mld/data/a2m/uestc.py`); `registry.py` keeps the synthetic datamodule for
it until those assets are present.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator

import numpy as np

HUMANACT12_CLASSES = 12


def aa_to_rot6d_diffusion(aa: np.ndarray) -> np.ndarray:
    """(..., J, 3) axis-angle -> (..., J, 6) diffusion-layout rot6d (the
    first two matrix columns, row-major — `compute_mean_std.py:50-56`)."""
    from scipy.spatial.transform import Rotation

    shape = aa.shape[:-1]
    R = Rotation.from_rotvec(aa.reshape(-1, 3).astype(np.float64)).as_matrix()
    return R[:, :, :2].reshape(*shape, 6).astype(np.float32)


def clip_to_features(pose_aa: np.ndarray, joints3d: np.ndarray,
                     num_frames: int) -> tuple:
    """One release clip -> (motion (num_frames, 150), length)."""
    T = min(len(pose_aa), num_frames)
    rot6d = aa_to_rot6d_diffusion(
        pose_aa[:T].reshape(T, 24, 3)).reshape(T, 144)
    transl = joints3d[:T, 0].astype(np.float32)          # root trajectory
    transl = transl - transl[:1]                         # start at origin
    feats = np.zeros((num_frames, 150), np.float32)
    feats[:T, :144] = rot6d
    feats[:T, 144:147] = transl
    return feats, np.int32(T)


class HumanAct12DataModule:
    """Real-release datamodule; the HumanAct12 protocol trains and evaluates
    on the same clip set (`humanact12poses.py:31` uses every index for
    train; FID compares generated vs dataset statistics)."""

    def __init__(self, cfg, pkl_path: str, num_frames: int = 60):
        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        feats, lengths, labels = [], [], []
        for pose, joints, y in zip(data["poses"], data["joints3D"], data["y"]):
            if len(pose) < 2:
                continue
            m, L = clip_to_features(np.asarray(pose), np.asarray(joints),
                                    num_frames)
            feats.append(m)
            lengths.append(L)
            labels.append(np.int32(y))
        self._data = {
            "motion": np.stack(feats),
            "length": np.asarray(lengths, np.int32),
            "action": np.asarray(labels, np.int32),
        }
        if cfg is not None and cfg.get("DEBUG", False):
            self._data = {k: v[:32] for k, v in self._data.items()}
        n = len(self._data["motion"])
        self.nfeats = 150
        self.num_classes = HUMANACT12_CLASSES
        self.num_train = n
        self.is_synthetic = False
        self.name = "humanact12"
        self.mean = np.zeros(150, np.float32)
        self.std = np.ones(150, np.float32)

    def batches(self, split: str, batch_size: int, shuffle=None,
                seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self._data["motion"])
        idx = np.arange(n)
        if shuffle is None:
            shuffle = split == "train"
        if shuffle:
            np.random.RandomState(seed).shuffle(idx)
        for i in range(0, (n // batch_size) * batch_size, batch_size):
            sel = idx[i: i + batch_size]
            yield {k: v[sel] for k, v in self._data.items()}
