"""Text-to-motion metrics: R-precision, matching score, FID, Diversity,
MultiModality, and MPJPE/PA-MPJPE.

Reimplements `mld/models/metrics/tm2t.py:11-178`, `metrics/mm.py`,
`metrics/mr.py`, and the helpers in `metrics/utils.py`
(euclidean_distance_matrix, calculate_top_k, activation statistics, Fréchet
distance, diversity, multimodality). Embedding accumulation is host-side
numpy — the compute happens once per epoch on small (N, 512) matrices.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
import scipy.linalg


def euclidean_distance_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, D) x (M, D) -> (N, M) pairwise L2 (`metrics/utils.py`)."""
    d2 = np.sum(a**2, axis=1)[:, None] - 2 * a @ b.T + np.sum(b**2, axis=1)[None]
    return np.sqrt(np.maximum(d2, 0.0))


def calculate_top_k(argsort_mat: np.ndarray, top_k: int) -> np.ndarray:
    """(N, N) argsorted distance rows -> (N, top_k) cumulative hit mask."""
    n = argsort_mat.shape[0]
    gt = np.arange(n)[:, None]
    hits = argsort_mat[:, :top_k] == gt
    return np.cumsum(hits, axis=1) > 0


def activation_statistics(act: np.ndarray):
    return act.mean(axis=0), np.cov(act, rowvar=False)


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (`calculate_frechet_distance_np`)."""
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(cov1.dot(cov2))
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((cov1 + offset).dot(cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(covmean))


def diversity(act: np.ndarray, times: int, seed: int = 0) -> float:
    rng = np.random.RandomState(seed)
    n = act.shape[0]
    i1 = rng.choice(n, times, replace=False)
    i2 = rng.choice(n, times, replace=False)
    return float(np.linalg.norm(act[i1] - act[i2], axis=1).mean())


def multimodality(act: np.ndarray, times: int, seed: int = 0) -> float:
    """(N, mm_replications, D) per-sample embedding sets -> mean pairwise
    distance within samples (`calculate_multimodality_np`)."""
    rng = np.random.RandomState(seed)
    n, reps, _ = act.shape
    i1 = rng.choice(reps, times)
    i2 = rng.choice(reps, times)
    return float(np.linalg.norm(act[:, i1] - act[:, i2], axis=2).mean())


@dataclass
class TM2TMetrics:
    """R-precision / matching / FID / diversity accumulator
    (`tm2t.py:11-178`): embeddings cached per batch, computed once with a
    global shuffle and R_size=32 retrieval pools."""

    top_k: int = 3
    R_size: int = 32
    diversity_times: int = 300
    seed: int = 1234
    # deterministic-replay hook: an externally-supplied permutation used
    # instead of the seeded shuffle (cross-framework metric parity,
    # tools/preflight.py --end-to-end — the reference shuffles with
    # torch.randperm, `tm2t.py:89`, which no numpy seed can reproduce)
    shuffle_idx: np.ndarray = None
    text_embeddings: List[np.ndarray] = field(default_factory=list)
    recmotion_embeddings: List[np.ndarray] = field(default_factory=list)
    gtmotion_embeddings: List[np.ndarray] = field(default_factory=list)

    def update(self, text_emb, rec_emb, gt_emb) -> None:
        self.text_embeddings.append(np.asarray(text_emb).reshape(len(text_emb), -1))
        self.recmotion_embeddings.append(np.asarray(rec_emb).reshape(len(rec_emb), -1))
        self.gtmotion_embeddings.append(np.asarray(gt_emb).reshape(len(gt_emb), -1))

    def compute(self) -> Dict[str, float]:
        texts = np.concatenate(self.text_embeddings)
        gen = np.concatenate(self.recmotion_embeddings)
        gt = np.concatenate(self.gtmotion_embeddings)
        n = len(texts)
        if self.shuffle_idx is not None:
            shuffle = np.asarray(self.shuffle_idx)
            assert shuffle.shape == (n,), (shuffle.shape, n)
        else:
            rng = np.random.RandomState(self.seed)
            shuffle = rng.permutation(n)
        texts, gen, gt = texts[shuffle], gen[shuffle], gt[shuffle]

        metrics: Dict[str, float] = {}
        assert n >= self.R_size, f"need >= {self.R_size} sequences, got {n}"

        for name, motions in (("", gen), ("gt_", gt)):
            top_k_mat = np.zeros(self.top_k)
            matching = 0.0
            groups = n // self.R_size
            for i in range(groups):
                sl = slice(i * self.R_size, (i + 1) * self.R_size)
                dist = np.nan_to_num(euclidean_distance_matrix(texts[sl], motions[sl]))
                matching += np.trace(dist)
                top_k_mat += calculate_top_k(np.argsort(dist, axis=1), self.top_k).sum(0)
            R_count = groups * self.R_size
            metrics[f"{name}Matching_score"] = matching / R_count
            for k in range(self.top_k):
                metrics[f"{name}R_precision_top_{k + 1}"] = top_k_mat[k] / R_count

        mu, cov = activation_statistics(gen)
        gt_mu, gt_cov = activation_statistics(gt)
        metrics["FID"] = frechet_distance(gt_mu, gt_cov, mu, cov)

        dt = min(self.diversity_times, n - 1)
        metrics["Diversity"] = diversity(gen, dt, self.seed)
        metrics["gt_Diversity"] = diversity(gt, dt, self.seed)
        return metrics

    def reset(self) -> None:
        self.text_embeddings.clear()
        self.recmotion_embeddings.clear()
        self.gtmotion_embeddings.clear()


@dataclass
class MMMetrics:
    """MultiModality accumulator (`metrics/mm.py:11`)."""

    mm_num_times: int = 10
    seed: int = 1234
    mm_embeddings: List[np.ndarray] = field(default_factory=list)

    def update(self, mm_emb) -> None:
        # (B, mm_replications, D)
        self.mm_embeddings.append(np.asarray(mm_emb))

    def compute(self) -> Dict[str, float]:
        act = np.concatenate(self.mm_embeddings)
        return {"MultiModality": multimodality(act, self.mm_num_times, self.seed)}


def procrustes_align(S1: np.ndarray, S2: np.ndarray) -> np.ndarray:
    """Similarity transform of S1 (N, 3) onto S2 — the PA in PA-MPJPE
    (`EgoHMR/utils/pose_utils.py` compute_similarity_transform)."""
    mu1, mu2 = S1.mean(0), S2.mean(0)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = (X1**2).sum()
    K = X1.T @ X2
    U, s, Vh = np.linalg.svd(K)
    Z = np.eye(3)
    Z[-1, -1] = np.sign(np.linalg.det(U @ Vh))
    R = Vh.T @ Z @ U.T
    scale = np.trace(R @ K) / var1
    t = mu2 - scale * R @ mu1
    return scale * S1 @ R.T + t


@dataclass
class MRMetrics:
    """MPJPE / PA-MPJPE / ACCEL accumulator (`metrics/mr.py:11`)."""

    force_in_meter: bool = True
    sums: Dict[str, float] = field(default_factory=dict)
    count: int = 0

    def update(self, joints_pred: np.ndarray, joints_gt: np.ndarray, lengths) -> None:
        factor = 1000.0 if self.force_in_meter else 1.0
        for b in range(len(joints_pred)):
            L = int(lengths[b])
            p, g = np.asarray(joints_pred[b][:L]), np.asarray(joints_gt[b][:L])
            p_a = p - p[:, :1]
            g_a = g - g[:, :1]
            mpjpe = np.linalg.norm(p_a - g_a, axis=-1).mean() * factor
            pa = np.stack([procrustes_align(p[t], g[t]) for t in range(L)])
            pampjpe = np.linalg.norm(pa - g, axis=-1).mean() * factor
            self.sums["MPJPE"] = self.sums.get("MPJPE", 0.0) + mpjpe
            self.sums["PAMPJPE"] = self.sums.get("PAMPJPE", 0.0) + pampjpe
            if L > 2:
                accel_p = p[:-2] - 2 * p[1:-1] + p[2:]
                accel_g = g[:-2] - 2 * g[1:-1] + g[2:]
                accel = np.linalg.norm(accel_p - accel_g, axis=-1).mean() * factor
                self.sums["ACCEL"] = self.sums.get("ACCEL", 0.0) + accel
            self.count += 1

    def compute(self) -> Dict[str, float]:
        return {k: v / max(self.count, 1) for k, v in self.sums.items()}
