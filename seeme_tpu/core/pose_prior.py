"""SMPL pose priors for SMPLify fitting.

Port of the reference's MaxMixturePrior
(`mld/transforms/joints2rots/prior.py:98-230`): a GMM over the 69-d body
pose, scored with the max-mixture approximation
    nll(pose) = min_k [ 0.5 (pose - mu_k)^T P_k (pose - mu_k) - log w'_k ]
where w'_k = weights_k / ((2 pi)^(D/2) * sqrtdet_k / min_j sqrtdet_j)
(`prior.py:150-157, 179-195`, the `merged_log_likelihood` path that SMPLify
actually calls).

The GMM asset (`gmm_08.pkl`) is loaded when present; without it a synthetic
single-component standard-normal prior keeps fitting runnable (equivalent to
the L2 pose regularizer, flagged via `.is_fallback`).
"""

from __future__ import annotations

import math
import os
import pickle
from typing import Optional

import jax.numpy as jnp
import numpy as np

POSE_DIM = 69


class MaxMixturePrior:
    def __init__(self, gmm_path: Optional[str] = None, num_gaussians: int = 8,
                 epsilon: float = 1e-16):
        if gmm_path and os.path.isdir(gmm_path):
            gmm_path = os.path.join(gmm_path, f"gmm_{num_gaussians:02d}.pkl")
        if gmm_path and os.path.exists(gmm_path):
            with open(gmm_path, "rb") as f:
                gmm = pickle.load(f, encoding="latin1")
            if isinstance(gmm, dict):
                means = np.asarray(gmm["means"], np.float64)
                covs = np.asarray(gmm["covars"], np.float64)
                weights = np.asarray(gmm["weights"], np.float64)
            else:  # sklearn GMM object
                means = np.asarray(gmm.means_, np.float64)
                covs = np.asarray(gmm.covars_, np.float64)
                weights = np.asarray(gmm.weights_, np.float64)
            self.is_fallback = False
        else:
            # standard-normal single component: nll = 0.5 ||pose||^2 + const
            means = np.zeros((1, POSE_DIM))
            covs = np.eye(POSE_DIM)[None]
            weights = np.ones(1)
            self.is_fallback = True

        precisions = np.stack([np.linalg.inv(c) for c in covs])
        sqrdets = np.sqrt(np.maximum(
            np.array([np.linalg.det(c) for c in covs]), epsilon))
        const = (2 * math.pi) ** (means.shape[1] / 2.0)
        nll_weights = weights / (const * (sqrdets / sqrdets.min()))

        self.means = jnp.asarray(means, jnp.float32)
        self.precisions = jnp.asarray(precisions, jnp.float32)
        self.log_nll_weights = jnp.asarray(np.log(nll_weights), jnp.float32)

    def __call__(self, pose: jnp.ndarray) -> jnp.ndarray:
        """(B, 69) body pose -> (B,) max-mixture negative log likelihood."""
        diff = pose[:, None, :] - self.means[None]                 # (B, K, D)
        prod = jnp.einsum("kij,bkj->bki", self.precisions, diff)
        quad = jnp.sum(prod * diff, axis=-1)                       # (B, K)
        return jnp.min(0.5 * quad - self.log_nll_weights[None], axis=1)
