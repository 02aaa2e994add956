"""EgoBody / GIMO datamodule over preprocessed fixed-shape shards.

The reference's `EgoBodyData3` (`mld/data/humanml/data/dataset.py:1055-1794`)
does per-item python work in dataloader workers: npy-dict loads, per-frame
normalization, padding to 60 frames, kinect->holo->PV point-cloud transforms,
tuple assembly. TPU input pipelines want none of that at step time, so the
equivalent work happens once in `tools/preprocess_egobody.py`, which writes
one `.npz` per split with the fixed-shape batch contract
(`seeme_tpu/data/batch.py`); this module is then a zero-copy array slicer.

Split files: {root}/processed/{split}.npz with keys
  feats (N, T, 2, P) float32 normalized | transl (N, 2, T, 3) normalized |
  betas (N, 2, T, 10) | cam (N, T, 6) | length (N,) int32 |
  scene (N, n_pts, 3) [optional]
plus condition-variant keys the preprocessor can add (all optional):
  egoego_transl (N, T, 3) / egoego_orient (N, T, 3) — EgoEgo-predicted wearer
    root (`dataset.py:1225-1228, 1343-1367`), passed through verbatim;
  image_crops (N, K, 224, 224, 3) uint8 — K crops per window; one is sampled
    per batch draw and ImageNet-normalized into batch["image"], replicating
    the reference's random per-item crop pick (`dataset.py:1659-1660`).
plus {root}/processed/mean.npy / std.npy over the (P+3)-dim feature vector
(same contract as `our_process_smpl_split_NEW/{mean,std}.npy`,
`mld/data/EgoBody.py:124-131`).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator

import numpy as np


class EgoBodyDataModule:
    def __init__(self, cfg, root: str, pose_feats: int = 72):
        self.root = root
        proc = os.path.join(root, "processed")
        if not os.path.isdir(proc):
            raise FileNotFoundError(
                f"{proc} not found — run tools/preprocess_egobody.py over the "
                f"raw release first (the reference's pre_process_data.py stage)."
            )
        self.mean = np.load(os.path.join(proc, "mean.npy")).reshape(-1)
        self.std = np.load(os.path.join(proc, "std.npy")).reshape(-1)
        self.nfeats = pose_feats + 3
        self.name = cfg.get("DATASET_NAME", "egobody")
        self.is_synthetic = False
        self._proc = proc
        self._splits: Dict[str, Dict[str, np.ndarray]] = {}
        self._debug = bool(cfg.get("DEBUG", False))
        self.num_train = self._load("train")["feats"].shape[0] if os.path.exists(
            os.path.join(proc, "train.npz")) else 0

    def _load(self, split: str) -> Dict[str, np.ndarray]:
        if split not in self._splits:
            path = os.path.join(self._proc, f"{split}.npz")
            data = dict(np.load(path))
            if self._debug:  # tiny-dataset debug mode (`dataset.py:1148-1152`)
                data = {k: v[:10] for k, v in data.items()}
            self._splits[split] = data
        return self._splits[split]

    def split_array(self, split: str, key: str) -> np.ndarray:
        return self._load(split)[key]

    def attach_split_features(self, split: str, key: str, values: np.ndarray):
        """Attach a per-sample feature array (row i <-> sample i); batches
        slice every key of the split dict, so it rides along automatically."""
        data = self._load(split)
        assert len(values) == data["feats"].shape[0]
        data[key] = np.asarray(values)

    def split_arrays(self, split: str) -> Dict[str, np.ndarray]:
        """All per-sample arrays of a split (row i <-> sample i), for the
        device-resident gather path."""
        return self._load(split)

    def batch_indices(
        self, split: str, batch_size: int, shuffle=None, seed: int = 0,
        drop_last: bool = True,
    ):
        from .batch import epoch_indices

        if shuffle is None:
            shuffle = split == "train"
        n = self._load(split)["feats"].shape[0]
        return epoch_indices(n, batch_size, shuffle=shuffle, seed=seed,
                             drop_last=drop_last)

    def batches(
        self, split: str, batch_size: int, shuffle=None, seed: int = 0,
        drop_last: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        data = self._load(split)
        rng = np.random.RandomState(seed + 1)
        has_cached_scene = "scene_feats" in data
        for sel in self.batch_indices(split, batch_size, shuffle=shuffle,
                                      seed=seed, drop_last=drop_last):
            # cached frozen scene features supersede the raw 20k-pt cloud —
            # don't ship ~15 MB/step of unused points to the device
            batch = {k: v[sel] for k, v in data.items()
                     if k != "image_crops"
                     and not (k == "scene" and has_cached_scene)}
            if "image_crops" in data:
                crops = data["image_crops"][sel]  # (B, K, 224, 224, 3) uint8
                pick = rng.randint(0, crops.shape[1], size=len(sel))
                batch["image"] = imagenet_normalize(
                    crops[np.arange(len(sel)), pick])
            yield batch


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(crops_uint8: np.ndarray) -> np.ndarray:
    """(..., H, W, 3) uint8 RGB -> ImageNet-normalized float32
    (`dataset.py:1697-1706`)."""
    x = crops_uint8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
