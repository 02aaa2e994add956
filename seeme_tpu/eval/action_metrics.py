"""Action-to-motion and unconditional-generation metrics.

Reimplements the accumulator logic of `mld/models/metrics/gru.py`
(HUMANACTMetrics), `metrics/stgcn.py` (UESTCMetrics) and `metrics/uncond.py`
(UncondMetrics): FID, recognition accuracy, per-class diversity and
multimodality over the feature space of a pretrained action-recognition
embedder. The embedder itself is injected (`embed_fn(motion) ->
(features, logits)`), mirroring how the reference loads `humanact12_gru.pt` /
`uestc_stgcn.pt` checkpoints — converted weights plug in through the same
callable."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

from .t2m_metrics import activation_statistics, frechet_distance


def diversity_times(num_per_class: int, num_classes: int) -> int:
    return min(200, num_per_class * num_classes // 2)


@dataclass
class ActionMetrics:
    """FID / accuracy / Diversity / MultiModality on recognition features
    (`metrics/gru.py`, `metrics/stgcn.py`)."""

    num_classes: int
    seed: int = 1234
    gen_feats: List[np.ndarray] = field(default_factory=list)
    gt_feats: List[np.ndarray] = field(default_factory=list)
    gen_logits: List[np.ndarray] = field(default_factory=list)
    labels: List[np.ndarray] = field(default_factory=list)

    def update(self, gen_features, gt_features, gen_logits, labels) -> None:
        self.gen_feats.append(np.asarray(gen_features))
        self.gt_feats.append(np.asarray(gt_features))
        self.gen_logits.append(np.asarray(gen_logits))
        self.labels.append(np.asarray(labels))

    def compute(self) -> Dict[str, float]:
        if not self.gen_feats:
            raise RuntimeError(
                "ActionMetrics.compute() with no accumulated batches — the "
                "eval loop yielded nothing (test split smaller than the "
                "batch size?)")
        gen = np.concatenate(self.gen_feats)
        gt = np.concatenate(self.gt_feats)
        logits = np.concatenate(self.gen_logits)
        labels = np.concatenate(self.labels)
        rng = np.random.RandomState(self.seed)

        out: Dict[str, float] = {}
        out["accuracy"] = float((logits.argmax(-1) == labels).mean())
        mu_g, cov_g = activation_statistics(gen)
        mu_r, cov_r = activation_statistics(gt)
        out["FID"] = frechet_distance(mu_r, cov_r, mu_g, cov_g)

        n = len(gen)
        times = min(200, n // 2)
        i1 = rng.choice(n, times, replace=False)
        i2 = rng.choice(n, times, replace=False)
        out["Diversity"] = float(np.linalg.norm(gen[i1] - gen[i2], axis=1).mean())

        # multimodality: mean within-class pairwise distance
        dists = []
        for c in range(self.num_classes):
            idx = np.where(labels == c)[0]
            if len(idx) < 2:
                continue
            k = min(20, len(idx))
            a = gen[rng.choice(idx, k)]
            b = gen[rng.choice(idx, k)]
            dists.append(np.linalg.norm(a - b, axis=1).mean())
        if dists:
            out["MultiModality"] = float(np.mean(dists))
        return out

    def reset(self) -> None:
        for lst in (self.gen_feats, self.gt_feats, self.gen_logits, self.labels):
            lst.clear()


@dataclass
class UncondMetrics:
    """Unconditional-generation FID + Diversity + KID-style stats over
    evaluator features (`metrics/uncond.py:11`)."""

    seed: int = 1234
    gen_feats: List[np.ndarray] = field(default_factory=list)
    gt_feats: List[np.ndarray] = field(default_factory=list)

    def update(self, gen_features, gt_features) -> None:
        self.gen_feats.append(np.asarray(gen_features))
        self.gt_feats.append(np.asarray(gt_features))

    def compute(self) -> Dict[str, float]:
        if not self.gen_feats:
            raise RuntimeError(
                "UncondMetrics.compute() with no accumulated batches — the "
                "eval loop yielded nothing (test split smaller than the "
                "batch size?)")
        gen = np.concatenate(self.gen_feats)
        gt = np.concatenate(self.gt_feats)
        rng = np.random.RandomState(self.seed)
        mu_g, cov_g = activation_statistics(gen)
        mu_r, cov_r = activation_statistics(gt)
        n = len(gen)
        times = min(300, n // 2)
        i1 = rng.choice(n, times, replace=False)
        i2 = rng.choice(n, times, replace=False)
        return {
            "FID": frechet_distance(mu_r, cov_r, mu_g, cov_g),
            "Diversity": float(np.linalg.norm(gen[i1] - gen[i2], axis=1).mean()),
            "gt_Diversity": float(np.linalg.norm(gt[i1] - gt[i2], axis=1).mean()),
        }
