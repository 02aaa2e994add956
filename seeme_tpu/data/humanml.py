"""HumanML3D / KIT text-to-motion datamodules.

Real layout (the standard HumanML3D release the reference consumes,
`mld/data/humanml/data/dataset.py:257-478` Text2MotionDatasetV2):
  {root}/new_joint_vecs/*.npy   per-clip RIC features (T, 263|251)
  {root}/texts/*.txt            caption#tokens lines
  {root}/{split}.txt            clip id lists
  {root}/Mean.npy, Std.npy      feature normalization
Variable length is handled TPU-style: crop-to-unit-length like the reference
(UNIT_LEN=4) then pad to max_len with a length field — static shapes, masks
downstream.

Synthetic fallback generates plausible RIC features so the CPU bring-up
config (`config_vae_humanml3d.yaml`, BASELINE.json) always runs.
"""

from __future__ import annotations

import codecs
import os
import random
from typing import Dict, Iterator, List, Optional

import numpy as np

HUMANML_NFEATS = 263
KIT_NFEATS = 251


class SyntheticT2MDataset:
    def __init__(self, num_samples=64, max_len=196, min_len=40,
                 nfeats=HUMANML_NFEATS, seed=0, text_dim=768):
        rng = np.random.RandomState(seed)
        self.max_len = max_len
        self.nfeats = nfeats
        self.lengths = rng.randint(min_len, max_len + 1, num_samples)
        # per-class base pose + drift make the caption -> motion mapping
        # learnable (the a2m synthetic data does the same): the t2m system's
        # conditioning and a contrastively trained evaluator both have real
        # signal to pick up, so synthetic convergence runs mean something.
        # Class tables come from a FIXED stream so every split shares the
        # same 7 class signatures (real classes look alike across splits)
        crng = np.random.RandomState(7777)
        base = crng.randn(7, nfeats).astype(np.float32) * 0.4
        drift = crng.randn(7, nfeats).astype(np.float32) * 0.01
        self.motions = []
        for i in range(num_samples):
            T = self.lengths[i]
            c = i % 7
            m = base[c] + np.cumsum(
                rng.randn(T, nfeats).astype(np.float32) * 0.05 + drift[c], axis=0
            )
            self.motions.append(m)
        flat = np.concatenate(self.motions)
        self.mean = flat.mean(0)
        self.std = flat.std(0) + 1e-6
        self.texts = [f"a person performs action {i % 7}" for i in range(num_samples)]
        # deterministic pseudo text embeddings correlated with the label, at
        # the configured conditioning width — drawn from the same fixed
        # stream as the class tables so splits agree on them
        self.text_embs = crng.randn(7, text_dim).astype(np.float32)[
            np.arange(num_samples) % 7
        ]

    def __len__(self):
        return len(self.motions)

    def __getitem__(self, idx):
        T = self.max_len
        m = (self.motions[idx] - self.mean) / self.std
        out = np.zeros((T, self.nfeats), np.float32)
        out[: len(m)] = m
        return {
            "motion": out,
            "length": np.int32(len(m)),
            "text": self.texts[idx],
            "text_emb": self.text_embs[idx],
        }


class HumanML3DDataModule:
    """Datamodule with `renorm`/`feats2joints` (`mld/data/HumanML3D.py:11-75`)."""

    def __init__(self, cfg, root: Optional[str] = None, nfeats: int = HUMANML_NFEATS):
        self.nfeats = nfeats
        self.njoints = 22 if nfeats == HUMANML_NFEATS else 21
        self.max_len = int(cfg.select("DATASET.SAMPLER.MAX_LEN", 196))
        self.min_len = int(cfg.select("DATASET.SAMPLER.MIN_LEN", 40))
        self.unit_len = 4
        self.name = "humanml3d" if nfeats == HUMANML_NFEATS else "kit"
        self.is_synthetic = root is None or not os.path.isdir(
            os.path.join(root, "new_joint_vecs")
        )
        if self.is_synthetic:
            n = 32 if cfg.get("DEBUG", False) else 256
            # synthetic caption embeddings must match the denoiser's
            # conditioning width (`model.denoiser.params.text_encoded_dim`)
            tdim = int(cfg.select("model.denoiser.params.text_encoded_dim", 768) or 768)
            self._sets = {
                "train": SyntheticT2MDataset(n, self.max_len, self.min_len, nfeats, 0, tdim),
                "val": SyntheticT2MDataset(max(n // 4, 33), self.max_len, self.min_len, nfeats, 1, tdim),
                "test": SyntheticT2MDataset(max(n // 4, 33), self.max_len, self.min_len, nfeats, 2, tdim),
            }
            self.mean = self._sets["train"].mean
            self.std = self._sets["train"].std
            self.num_train = len(self._sets["train"])
        else:
            self.root = root
            self.mean = np.load(os.path.join(root, "Mean.npy"))
            self.std = np.load(os.path.join(root, "Std.npy"))
            # t2m evaluator stats (`mean_eval` contract, HumanML3D.py:47-55)
            for stat in ("mean_eval", "std_eval"):
                p = os.path.join(root, f"{stat.split('_')[0].capitalize()}_eval.npy")
                setattr(self, stat, np.load(p) if os.path.exists(p) else None)
            self._ids: Dict[str, List[str]] = {}
            for split in ("train", "val", "test"):
                path = os.path.join(root, f"{split}.txt")
                with codecs.open(path, "r") as f:
                    self._ids[split] = [ln.strip() for ln in f if ln.strip()]
            self.num_train = len(self._ids["train"])

    # -------------------------------------------------------------- sampling
    def _load_real(self, split: str, idx: str):
        m = np.load(os.path.join(self.root, "new_joint_vecs", idx + ".npy"))
        with codecs.open(os.path.join(self.root, "texts", idx + ".txt")) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        caption = lines[0].split("#")[0] if lines else ""
        return m.astype(np.float32), caption

    def split_arrays(self, split: str) -> Dict[str, np.ndarray]:
        """Per-sample arrays for the device-resident gather path. Synthetic
        only: captions there are precomputed `text_emb` rows, so training
        needs no host-side encoding; the real release loads motion/caption
        files lazily per id (host path). train.py catches the KeyError and
        falls back."""
        if not self.is_synthetic:
            raise KeyError("device-resident arrays: synthetic humanml only")
        ds = self._sets[split]
        items = [ds[i] for i in range(len(ds))]
        return {
            "motion": np.stack([it["motion"] for it in items]),
            "length": np.stack([it["length"] for it in items]),
            "text_emb": np.stack([it["text_emb"] for it in items]),
        }

    def batch_indices(
        self, split: str, batch_size: int, shuffle=None, seed: int = 0,
        drop_last: bool = True,
    ):
        from .batch import epoch_indices

        if not self.is_synthetic:
            raise KeyError("device-resident arrays: synthetic humanml only")
        if shuffle is None:
            shuffle = split == "train"
        return epoch_indices(len(self._sets[split]), batch_size,
                             shuffle=shuffle, seed=seed, drop_last=drop_last)

    def batches(
        self, split: str, batch_size: int, shuffle=None, seed: int = 0,
        drop_last: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        if shuffle is None:
            shuffle = split == "train"
        if self.is_synthetic:
            from .batch import epoch_indices

            ds = self._sets[split]
            for sel in epoch_indices(len(ds), batch_size, shuffle=shuffle,
                                     seed=seed, drop_last=drop_last):
                items = [ds[j] for j in sel]
                yield {
                    "motion": np.stack([it["motion"] for it in items]),
                    "length": np.stack([it["length"] for it in items]),
                    "text": [it["text"] for it in items],
                    "text_emb": np.stack([it["text_emb"] for it in items]),
                }
            return

        rng = random.Random(seed)
        ids = list(self._ids[split])
        if shuffle:
            rng.shuffle(ids)
        batch: List = []
        for idx in ids:
            try:
                m, caption = self._load_real(split, idx)
            except FileNotFoundError:
                continue
            if len(m) < self.min_len:
                continue
            # crop to unit length (`dataset.py:406-426` coin2 logic simplified
            # to the deterministic 'fixed' branch)
            L = (len(m) // self.unit_len) * self.unit_len
            start = rng.randint(0, len(m) - L) if shuffle and len(m) > L else 0
            m = m[start : start + L][: self.max_len]
            feat = np.zeros((self.max_len, self.nfeats), np.float32)
            feat[: len(m)] = (m - self.mean) / self.std
            batch.append({"motion": feat, "length": np.int32(len(m)), "text": caption})
            if len(batch) == batch_size:
                yield {
                    "motion": np.stack([b["motion"] for b in batch]),
                    "length": np.stack([b["length"] for b in batch]),
                    "text": [b["text"] for b in batch],
                }
                batch = []
        if batch and not drop_last:
            yield {
                "motion": np.stack([b["motion"] for b in batch]),
                "length": np.stack([b["length"] for b in batch]),
                "text": [b["text"] for b in batch],
            }

    # ------------------------------------------------------------- transforms
    def renorm(self, features):
        return features * self.std + self.mean

    def renorm4t2m(self, features):
        """Dataset normalization -> t2m-evaluator normalization
        (`renorm4t2m`, `mld/data/HumanML3D.py:47-55`). Identity when the
        evaluator stats (mean_eval.npy/std_eval.npy beside mean/std) are
        absent — the synthetic fallback."""
        raw = features * self.std + self.mean
        if getattr(self, "mean_eval", None) is not None:
            return (raw - self.mean_eval) / self.std_eval
        return raw

    def feats2joints(self, features):
        """normalized features -> (B, T, njoints, 3) via RIC recovery
        (`mld/data/HumanML3D.py:41-45`)."""
        import jax.numpy as jnp

        from ..core.ric import recover_from_ric

        raw = jnp.asarray(features) * self.std + self.mean
        return recover_from_ric(raw, self.njoints)
