#!/usr/bin/env python
"""Break down the bench sampling window on the real chip.

The north-star window (bench.py) is [interactee VAE encode -> DDIM-50 fused
-> VAE decode] at batch 64. This script times each component amortized (K
dependent iterations inside one jitted program, scalar-synced, one relay
round trip subtracted) so optimization effort goes where the time is.

Run: python scripts/window_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 64
K = 20
RELAY_S = 0.032


def timed(fn, *args):
    import jax

    f = jax.jit(fn)
    for _ in range(2):
        float(f(*args))
    best = min(
        (lambda t0: (float(f(*args)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(5)
    )
    return (best - RELAY_S) / K * 1000.0  # ms per iteration


def main():
    import jax
    import jax.numpy as jnp

    from seeme_tpu.core import synthetic_smpl
    from seeme_tpu.data import SyntheticEgoDataset
    from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem
    from seeme_tpu.ops.denoiser_fused import ddim_fused, ddim_schedule_arrays

    cfg = SeeMeConfig()
    data = SyntheticEgoDataset(num_samples=BATCH, motion_length=cfg.motion_length,
                               scene_points=cfg.scene_points, seed=0)
    system = SeeMeSystem(cfg, synthetic_smpl(n_verts=6890), data.mean, data.std)
    params = system.init_params(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in next(data.batches(BATCH, shuffle=False)).items()}
    f_int = jnp.concatenate([batch["feats"][:, :, 1, :], batch["transl"][:, 1]], axis=-1)
    z = jnp.zeros((BATCH, cfg.latent_dim[0], cfg.latent_dim[-1]))
    tsa, acp_t, acp_prev = ddim_schedule_arrays(system.schedule, cfg.num_inference_timesteps)
    cond = jnp.zeros((BATCH, system.n_cond_tokens, cfg.latent_dim[-1]))

    def encode_k(params, x):
        def body(i, acc):
            mu, _ = system.encode_motion_latent(params["vae"], x + acc * 1e-12)
            return acc + mu.sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    def decode_k(params, z):
        def body(i, acc):
            out = system.vae.apply(params["vae"], z + acc * 1e-12,
                                   cfg.motion_length, method=system.vae.decode)
            return acc + out.sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    def ddim_k(params, z0, cond):
        def body(i, acc):
            out = ddim_fused(params["denoiser"], cond, z0 + acc * 1e-12,
                             tsa, acp_t, acp_prev,
                             num_steps=cfg.num_inference_timesteps)
            return acc + out.sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    result = {
        "batch": BATCH,
        "encode_ms": round(timed(encode_k, params, f_int), 3),
        "ddim50_fused_ms": round(timed(ddim_k, params, z, cond), 3),
        "decode_ms": round(timed(decode_k, params, z), 3),
    }
    result["window_ms"] = round(
        result["encode_ms"] + result["ddim50_fused_ms"] + result["decode_ms"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
