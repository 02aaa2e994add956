"""Conditional Glow normalizing flow — exact nflows parity.

Reimplements the subset of the vendored nflows library that ProHMR's SMPLFlow
uses (`nflows/nflows/flows/glow.py:15-64`): per layer
ActNorm -> LULinear -> AdditiveCoupling(ResidualNet(context)), alternating
coupling masks, StandardNormal base. Everything is a pure function over an
explicit parameter pytree — no hidden buffers — so torch checkpoints convert
field-for-field and log-probs can be compared bit-level (BASELINE.json's
"exact log-prob parity" target).

Semantics preserved:
  * ActNorm (`transforms/normalization.py:146-221`): y = exp(log_scale) x +
    shift, logabsdet = sum(log_scale); data-dependent init is an explicit
    `initialize_actnorm` pass (std clamp 1e-3, mu of x/std) instead of the
    reference's lazy first-forward mutation.
  * LULinear (`transforms/lu.py:10-128`): W = L U with unit lower-diagonal and
    softplus(upper_diag)+eps; identity init (constant log(exp(1-eps)-1));
    y = L(U x) + b forward, triangular solves inverse; logabsdet =
    sum log upper_diag.
  * AdditiveCoupling (`transforms/coupling.py:19-243`): identity features are
    mask<=0, transform features mask>0; shift = ResidualNet(identity, context);
    logabsdet = 0.
  * ResidualNet (`nn/nets/resnet.py:56-104`): context concatenated at the
    input layer; two pre-activation residual blocks with BatchNorm1d (running
    stats; Glow passes batch_norm_within_layers=True) and dropout(0.5) at
    train time; final layer init U(-0.01/sqrt(h), ...).
  * Flow.log_prob / sample_and_log_prob (`flows/base.py:62-123`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class GlowConfig:
    features: int = 144
    hidden_features: int = 1024
    num_layers: int = 4
    num_blocks_per_layer: int = 2
    context_features: Optional[int] = None
    dropout_probability: float = 0.5
    use_batch_norm: bool = True
    eps: float = 1e-3  # LULinear diag eps
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    def masks(self) -> np.ndarray:
        """Per-layer coupling masks: layer 0 mask has -1 at even indices
        (`glow.py:35-36`), flipped each layer (`glow.py:57`)."""
        mask = np.ones(self.features)
        mask[::2] = -1
        out = []
        for _ in range(self.num_layers):
            out.append(mask.copy())
            mask = -mask
        return np.stack(out)


# --------------------------------------------------------------------- init

def _linear_init(rng, fan_in, fan_out):
    """torch.nn.Linear default init: U(-k, k), k = 1/sqrt(fan_in)."""
    k = 1.0 / math.sqrt(fan_in)
    wr, br = jax.random.split(rng)
    w = jax.random.uniform(wr, (fan_out, fan_in), minval=-k, maxval=k)
    b = jax.random.uniform(br, (fan_out,), minval=-k, maxval=k)
    return {"w": w, "b": b}


def _bn_init(features):
    return {
        "scale": jnp.ones(features),
        "bias": jnp.zeros(features),
        "mean": jnp.zeros(features),
        "var": jnp.ones(features),
    }


def init_resnet(rng, cfg: GlowConfig, in_features: int, out_features: int) -> Dict:
    h = cfg.hidden_features
    rngs = jax.random.split(rng, 2 + 2 * cfg.num_blocks_per_layer)
    ctx = cfg.context_features or 0
    params = {"initial": _linear_init(rngs[0], in_features + ctx, h), "blocks": []}
    for i in range(cfg.num_blocks_per_layer):
        block = {
            "linear0": _linear_init(rngs[1 + 2 * i], h, h),
            "linear1": _linear_init(rngs[2 + 2 * i], h, h),
        }
        # zero_initialization=True: last linear U(-1e-3, 1e-3) (`resnet.py:36-38`)
        kr = jax.random.fold_in(rngs[2 + 2 * i], 7)
        block["linear1"]["w"] = jax.random.uniform(kr, (h, h), minval=-1e-3, maxval=1e-3)
        block["linear1"]["b"] = jax.random.uniform(
            jax.random.fold_in(kr, 1), (h,), minval=-1e-3, maxval=1e-3
        )
        if cfg.use_batch_norm:
            block["bn0"] = _bn_init(h)
            block["bn1"] = _bn_init(h)
        params["blocks"].append(block)
    stdv = 0.01 / math.sqrt(h)
    fr = rngs[-1]
    params["final"] = {
        "w": jax.random.uniform(fr, (out_features, h), minval=-stdv, maxval=stdv),
        "b": jax.random.uniform(jax.random.fold_in(fr, 1), (out_features,), minval=-stdv, maxval=stdv),
    }
    return params


def init_glow(rng, cfg: GlowConfig) -> Dict:
    D = cfg.features
    n_tri = ((D - 1) * D) // 2
    masks = cfg.masks()
    layers = []
    for i in range(cfg.num_layers):
        rng, r = jax.random.split(rng)
        n_identity = int((masks[i] <= 0).sum())
        n_transform = D - n_identity
        layers.append(
            {
                "actnorm": {"log_scale": jnp.zeros(D), "shift": jnp.zeros(D)},
                "lu": {
                    "lower_entries": jnp.zeros(n_tri),
                    "upper_entries": jnp.zeros(n_tri),
                    # identity init (`lu.py:33-37`)
                    "unconstrained_upper_diag": jnp.full(
                        D, math.log(math.exp(1 - cfg.eps) - 1)
                    ),
                    "bias": jnp.zeros(D),
                },
                "coupling": {"resnet": init_resnet(r, cfg, n_identity, n_transform)},
            }
        )
    return {"layers": layers}


# ----------------------------------------------------------------- pieces

def _resnet_apply(
    params: Dict,
    cfg: GlowConfig,
    inputs: jnp.ndarray,
    context: Optional[jnp.ndarray],
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    x = inputs if context is None else jnp.concatenate([inputs, context], axis=1)
    h = x @ params["initial"]["w"].T + params["initial"]["b"]
    for block in params["blocks"]:
        t = h
        if cfg.use_batch_norm:
            bn = block["bn0"]
            t = (t - bn["mean"]) / jnp.sqrt(bn["var"] + cfg.bn_eps) * bn["scale"] + bn["bias"]
        t = jax.nn.relu(t)
        t = t @ block["linear0"]["w"].T + block["linear0"]["b"]
        if cfg.use_batch_norm:
            bn = block["bn1"]
            t = (t - bn["mean"]) / jnp.sqrt(bn["var"] + cfg.bn_eps) * bn["scale"] + bn["bias"]
        t = jax.nn.relu(t)
        if train and cfg.dropout_probability > 0 and rng is not None:
            rng, dr = jax.random.split(rng)
            keep = jax.random.bernoulli(dr, 1 - cfg.dropout_probability, t.shape)
            t = jnp.where(keep, t / (1 - cfg.dropout_probability), 0.0)
        t = t @ block["linear1"]["w"].T + block["linear1"]["b"]
        h = h + t
    return h @ params["final"]["w"].T + params["final"]["b"]


def _lu_matrices(lu: Dict, cfg: GlowConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    D = cfg.features
    li = np.tril_indices(D, k=-1)
    ui = np.triu_indices(D, k=1)
    lower = jnp.zeros((D, D)).at[li].set(lu["lower_entries"]).at[np.diag_indices(D)].set(1.0)
    upper_diag = jax.nn.softplus(lu["unconstrained_upper_diag"]) + cfg.eps
    upper = jnp.zeros((D, D)).at[ui].set(lu["upper_entries"]).at[np.diag_indices(D)].set(upper_diag)
    return lower, upper


def _actnorm_forward(p, x):
    scale = jnp.exp(p["log_scale"])
    return scale * x + p["shift"], jnp.full(x.shape[0], jnp.sum(p["log_scale"]))


def _actnorm_inverse(p, x):
    scale = jnp.exp(p["log_scale"])
    return (x - p["shift"]) / scale, jnp.full(x.shape[0], -jnp.sum(p["log_scale"]))


def _lu_forward(p, cfg, x):
    lower, upper = _lu_matrices(p, cfg)
    out = (x @ upper.T) @ lower.T + p["bias"]
    logdet = jnp.sum(jnp.log(jax.nn.softplus(p["unconstrained_upper_diag"]) + cfg.eps))
    return out, jnp.full(x.shape[0], logdet)


def _lu_inverse(p, cfg, x):
    lower, upper = _lu_matrices(p, cfg)
    out = x - p["bias"]
    out = jax.scipy.linalg.solve_triangular(lower, out.T, lower=True, unit_diagonal=True)
    out = jax.scipy.linalg.solve_triangular(upper, out, lower=False).T
    logdet = -jnp.sum(jnp.log(jax.nn.softplus(p["unconstrained_upper_diag"]) + cfg.eps))
    return out, jnp.full(x.shape[0], logdet)


def _coupling_forward(p, cfg, mask, x, context, train=False, rng=None):
    identity_idx = np.where(mask <= 0)[0]
    transform_idx = np.where(mask > 0)[0]
    identity = x[:, identity_idx]
    transform = x[:, transform_idx]
    shift = _resnet_apply(p["resnet"], cfg, identity, context, train, rng)
    transform = transform + shift
    out = jnp.zeros_like(x).at[:, identity_idx].set(identity).at[:, transform_idx].set(transform)
    return out, jnp.zeros(x.shape[0])


def _coupling_inverse(p, cfg, mask, x, context, train=False, rng=None):
    identity_idx = np.where(mask <= 0)[0]
    transform_idx = np.where(mask > 0)[0]
    identity = x[:, identity_idx]
    transform = x[:, transform_idx]
    shift = _resnet_apply(p["resnet"], cfg, identity, context, train, rng)
    transform = transform - shift
    out = jnp.zeros_like(x).at[:, identity_idx].set(identity).at[:, transform_idx].set(transform)
    return out, jnp.zeros(x.shape[0])


# ------------------------------------------------------------------- flow

def glow_forward(
    params: Dict, cfg: GlowConfig, inputs: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """data -> noise with total logabsdet (CompositeTransform.forward)."""
    masks = cfg.masks()
    x = inputs
    total = jnp.zeros(x.shape[0])
    for i, layer in enumerate(params["layers"]):
        x, ld = _actnorm_forward(layer["actnorm"], x)
        total += ld
        x, ld = _lu_forward(layer["lu"], cfg, x)
        total += ld
        x, ld = _coupling_forward(layer["coupling"], cfg, masks[i], x, context)
        total += ld
    return x, total


def glow_inverse(
    params: Dict, cfg: GlowConfig, noise: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """noise -> data with total logabsdet of the inverse pass."""
    masks = cfg.masks()
    x = noise
    total = jnp.zeros(x.shape[0])
    for i in reversed(range(cfg.num_layers)):
        layer = params["layers"][i]
        x, ld = _coupling_inverse(layer["coupling"], cfg, masks[i], x, context)
        total += ld
        x, ld = _lu_inverse(layer["lu"], cfg, x)
        total += ld
        x, ld = _actnorm_inverse(layer["actnorm"], x)
        total += ld
    return x, total


def _standard_normal_logprob(z: jnp.ndarray) -> jnp.ndarray:
    D = z.shape[-1]
    return -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * D * math.log(2 * math.pi)


def glow_log_prob(
    params: Dict, cfg: GlowConfig, inputs: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flow.log_prob (`flows/base.py:39-60`): returns (log_prob, noise)."""
    noise, logabsdet = glow_forward(params, cfg, inputs, context)
    return _standard_normal_logprob(noise) + logabsdet, noise


def glow_sample_and_log_prob(
    params: Dict, cfg: GlowConfig, num_samples: int,
    context: jnp.ndarray, rng: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flow.sample_and_log_prob (`flows/base.py:62-123`): draws (or consumes)
    base noise per context row, returns (samples, log_prob, noise) with
    shapes (B*num_samples, D), (B*num_samples,), (B*num_samples, D)."""
    B = context.shape[0]
    if noise is None:
        assert rng is not None
        noise = jax.random.normal(rng, (B, num_samples, cfg.features))
    noise_flat = noise.reshape(B * num_samples, cfg.features)
    ctx = jnp.repeat(context, num_samples, axis=0)
    samples, logabsdet = glow_inverse(params, cfg, noise_flat, ctx)
    log_prob = _standard_normal_logprob(noise_flat) - logabsdet
    return samples, log_prob, noise_flat


def initialize_actnorm(
    params: Dict, cfg: GlowConfig, inputs: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
) -> Dict:
    """Explicit data-dependent ActNorm init (replaces the lazy first-forward
    mutation, `normalization.py:196-221` + warmup `prohmr_scene.py:82-97`):
    per layer, log_scale = -log(max(std, 1e-3)), shift = -mean(x/std), using
    the activations flowing into that layer."""
    masks = cfg.masks()
    x = inputs
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        std = jnp.maximum(jnp.std(x, axis=0, ddof=1), 1e-3)
        mu = jnp.mean(x / std, axis=0)
        actnorm = {"log_scale": -jnp.log(std), "shift": -mu}
        x, _ = _actnorm_forward(actnorm, x)
        x, _ = _lu_forward(layer["lu"], cfg, x)
        x, _ = _coupling_forward(layer["coupling"], cfg, masks[i], x, context)
        new_layers.append({**layer, "actnorm": actnorm})
    return {"layers": new_layers}
