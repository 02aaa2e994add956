"""Dataset registry: config name -> datamodule.

Replaces `mld/data/get_data.py:85-320`'s if/elif dispatch with a registry.
Each datamodule exposes `train/val/test` split iterators with the fixed-shape
batch contract (`seeme_tpu/data/batch.py`), plus `mean`/`std`/`nfeats`.

Real EgoBody/GIMO shards (the `.npy` layout produced by the reference's
`pre_process_data.py`) load when present under DATASET.ROOT; otherwise the
synthetic datamodule keeps every config runnable (the reference's DEBUG
tiny-dataset pattern, `dataset.py:1148-1152`, with generated data).
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import numpy as np

from .egobody import EgoBodyDataModule
from .synthetic import SyntheticEgoDataset

_REGISTRY: Dict[str, Callable] = {}


def register_dataset(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


class SyntheticDataModule:
    """Datamodule wrapper over SyntheticEgoDataset with per-split datasets."""

    def __init__(self, cfg, num_train=256, num_eval=64):
        pose_feats = 72 if cfg.get("DATASET_NAME", "egobody") == "egobody" else 66
        T = int(cfg.get("MOTION_LENGTH", 60))
        cond = tuple(cfg.select("model.condition", []) or [])
        with_scene = "scene" in cond
        with_image = "image" in cond
        pts = int(cfg.select("model.scene_points", 1024)) if with_scene else 0
        if cfg.get("DEBUG", False):
            num_train, num_eval = 32, 16
        common = dict(
            motion_length=T, pose_feats=pose_feats,
            scene_points=max(pts, 1), with_scene=with_scene,
            with_image=with_image,
        )
        self.train_set = SyntheticEgoDataset(num_train, seed=0, **common)
        self.val_set = SyntheticEgoDataset(num_eval, seed=1, **common)
        self.test_set = SyntheticEgoDataset(num_eval, seed=2, **common)
        self.mean = self.train_set.mean
        self.std = self.train_set.std
        self.num_train = len(self.train_set)
        self.nfeats = pose_feats + 3
        self.name = cfg.get("DATASET_NAME", "egobody")
        self.is_synthetic = True

    def batches(self, split: str, batch_size: int, shuffle=None, seed: int = 0,
                drop_last: bool = True):
        if split == "val" and self.name == "gimo":
            split = "test"  # GIMO aliases val to test (`dataset.py:1840-1842`)
        ds = getattr(self, f"{split}_set")
        if shuffle is None:
            shuffle = split == "train"
        return ds.batches(batch_size, shuffle=shuffle, seed=seed,
                          drop_last=drop_last)

    def _split(self, split: str):
        if split == "val" and self.name == "gimo":
            split = "test"  # same alias as batches()
        return getattr(self, f"{split}_set")

    def split_arrays(self, split: str):
        return self._split(split).split_arrays()

    def batch_indices(self, split: str, batch_size: int, shuffle=None,
                      seed: int = 0, drop_last: bool = True):
        if shuffle is None:
            shuffle = split == "train"
        return self._split(split).batch_indices(
            batch_size, shuffle=shuffle, seed=seed, drop_last=drop_last)

    def split_array(self, split: str, key: str) -> np.ndarray:
        return getattr(self._split(split), key)

    def attach_split_features(self, split: str, key: str, values: np.ndarray):
        """Attach a per-sample feature array (row i <-> sample i) so every
        batch carries `key` sliced alongside the raw fields — the frozen
        scene-embedding cache the stage-2 train loop precomputes."""
        ds = self._split(split)
        assert len(values) == len(ds), (len(values), len(ds))
        ds.extras[key] = np.asarray(values)


@register_dataset("egobody")
def _egobody(cfg):
    root = os.path.join(cfg.select("DATASET.ROOT", "./datasets"), "EgoBody")
    if not cfg.select("DATASET.SYNTHETIC", False) and os.path.isdir(root):
        return EgoBodyDataModule(cfg, root)
    return SyntheticDataModule(cfg)


@register_dataset("gimo")
def _gimo(cfg):
    root = os.path.join(cfg.select("DATASET.ROOT", "./datasets"), "GIMO")
    if not cfg.select("DATASET.SYNTHETIC", False) and os.path.isdir(root):
        return EgoBodyDataModule(cfg, root, pose_feats=66)
    return SyntheticDataModule(cfg)


def get_datamodule(cfg):
    """`get_datasets(cfg)` equivalent — first configured train dataset."""
    names = list(cfg.select("TRAIN.DATASETS", None) or [cfg.get("DATASET_NAME", "egobody")])
    name = names[0]
    if name not in _REGISTRY:
        raise KeyError(f"unknown dataset {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg)


@register_dataset("humanml3d")
def _humanml3d(cfg):
    from .humanml import HumanML3DDataModule

    root = os.path.join(cfg.select("DATASET.ROOT", "./datasets"), "HumanML3D")
    return HumanML3DDataModule(cfg, root if os.path.isdir(root) else None)


@register_dataset("kit")
def _kit(cfg):
    from .humanml import KIT_NFEATS, HumanML3DDataModule

    root = os.path.join(cfg.select("DATASET.ROOT", "./datasets"), "KIT-ML")
    return HumanML3DDataModule(
        cfg, root if os.path.isdir(root) else None, nfeats=KIT_NFEATS
    )


class SyntheticA2MDataModule:
    """HumanAct12/UESTC-shaped action-to-motion data (synthetic fallback for
    the `mld/data/a2m/` loaders; real loaders need the action releases)."""

    def __init__(self, cfg, num_classes=12, nfeats=150, num_frames=60):
        rng = np.random.RandomState(0)
        if cfg.get("DEBUG", False):
            n = 48
        else:
            n = 240
        self.nfeats = nfeats
        self.num_classes = num_classes
        self.num_train = n
        self.is_synthetic = True
        self.name = cfg.get("DATASET_NAME", "humanact12")
        self.mean = np.zeros(nfeats, np.float32)
        self.std = np.ones(nfeats, np.float32)

        # one class-signature table for ALL splits (a real dataset's classes
        # look the same in train and test; per-split bases made a natively
        # trained recognition model score 0 on val)
        base = rng.randn(num_classes, 1, nfeats).astype(np.float32)

        def make(n_samples, seed):
            r = np.random.RandomState(seed)
            labels = r.randint(0, num_classes, n_samples)
            motion = np.cumsum(
                r.randn(n_samples, num_frames, nfeats).astype(np.float32) * 0.02,
                axis=1,
            ) + base[labels]
            return {
                "motion": motion,
                "action": labels.astype(np.int32),
                "length": np.full(n_samples, num_frames, np.int32),
            }

        self._splits = {"train": make(n, 0), "val": make(n // 4, 1), "test": make(n // 4, 2)}

    def split_arrays(self, split):
        return self._splits[split]

    def batch_indices(self, split, batch_size, shuffle=None, seed=0,
                      drop_last=True):
        from .batch import epoch_indices

        if shuffle is None:
            shuffle = split == "train"
        return epoch_indices(len(self._splits[split]["motion"]), batch_size,
                             shuffle=shuffle, seed=seed, drop_last=drop_last)

    def batches(self, split, batch_size, shuffle=None, seed=0,
                drop_last=True):
        data = self._splits[split]
        for sel in self.batch_indices(split, batch_size, shuffle=shuffle,
                                      seed=seed, drop_last=drop_last):
            yield {k: v[sel] for k, v in data.items()}


@register_dataset("humanact12")
def _humanact12(cfg):
    pkl_path = os.path.join(
        cfg.select("DATASET.ROOT", "./datasets") or "./datasets",
        "HumanAct12Poses", "humanact12poses.pkl")
    if not cfg.select("DATASET.SYNTHETIC", False) and os.path.exists(pkl_path):
        from .a2m import HumanAct12DataModule

        return HumanAct12DataModule(cfg, pkl_path,
                                    num_frames=int(cfg.get("MOTION_LENGTH", 60)))
    return SyntheticA2MDataModule(cfg, num_classes=12, nfeats=150)


@register_dataset("uestc")
def _uestc(cfg):
    root = os.path.join(
        cfg.select("DATASET.ROOT", "./datasets") or "./datasets", "uestc")
    vibe_pkl = os.path.join(root, "vibe_cache_refined.pkl")
    if not cfg.select("DATASET.SYNTHETIC", False) and os.path.exists(vibe_pkl):
        from .a2m import UestcDataModule

        return UestcDataModule(cfg, root,
                               num_frames=int(cfg.get("MOTION_LENGTH", 60)))
    return SyntheticA2MDataModule(cfg, num_classes=40, nfeats=150)
