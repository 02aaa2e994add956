"""Pure-function training losses.

Reimplements `mld/models/losses/mld.py:10-200` (MLDLosses) as stateless
functions returning (total, dict-of-unweighted-terms); accumulation across
steps lives in the train loop, and cross-device reduction is a `psum` the
compiler inserts — torchmetrics state machinery is unnecessary under pjit.

Weights come from the config LOSS block exactly as in the reference:
LAMBDA_REC (recons_feature), LAMBDA_JOINT (recons_joints), LAMBDA_ROOT
(recons_transl), LAMBDA_KL (kl_motion); the diffusion noise MSE has weight 1
(`losses/mld.py:70-102`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.SmoothL1Loss(reduction='mean'), beta=1."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def kl_standard_normal(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """mean KL( N(mu, sigma) || N(0, 1) ) — matches
    `torch.distributions.kl_divergence(...).mean()` (`losses/mld.py:178-188`)."""
    return jnp.mean(0.5 * (mu**2 + jnp.exp(logvar) - logvar - 1.0))


@dataclass(frozen=True)
class LossWeights:
    lambda_rec: float = 1.0
    lambda_joint: float = 1.0
    lambda_root: float = 1.0
    lambda_kl: float = 1.0e-4


def vae_losses(
    feats_rst: jnp.ndarray,
    feats_ref: jnp.ndarray,
    joints_rst: jnp.ndarray,
    joints_ref: jnp.ndarray,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    weights: LossWeights,
    predict_transl: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Stage-1 VAE loss (`losses/mld.py:113-128`).

    joints are (B, T, J, 3); with predict_transl the pelvis (joint 0) is
    compared separately and the joint loss is pelvis-aligned
    (`align_root`, :104-111).
    """
    terms: Dict[str, jnp.ndarray] = {}
    total = 0.0
    if predict_transl:
        pelvis_ref = joints_ref[:, :, :1]
        pelvis_rst = joints_rst[:, :, :1]
        joints_ref = joints_ref - pelvis_ref
        joints_rst = joints_rst - pelvis_rst
        terms["recons_transl"] = smooth_l1(pelvis_rst, pelvis_ref)
        total += weights.lambda_root * terms["recons_transl"]
    terms["recons_feature"] = smooth_l1(feats_rst, feats_ref)
    total += weights.lambda_rec * terms["recons_feature"]
    terms["recons_joints"] = smooth_l1(joints_rst, joints_ref)
    total += weights.lambda_joint * terms["recons_joints"]
    terms["kl_motion"] = kl_standard_normal(mu, logvar)
    total += weights.lambda_kl * terms["kl_motion"]
    terms["total"] = total
    return total, terms


def diffusion_losses(
    noise_pred: jnp.ndarray, noise: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Stage-2 noise-prediction MSE (`losses/mld.py:130-138`, predict_epsilon)."""
    loss = mse(noise_pred, noise)
    return loss, {"inst_loss": loss, "total": loss}


def x0_losses(
    pred: jnp.ndarray, latent: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """x0-prediction variant (PREDICT_EPSILON=False, `losses/mld.py:136-138`)."""
    loss = mse(pred, latent)
    return loss, {"x_loss": loss, "total": loss}
