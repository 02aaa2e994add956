#!/usr/bin/env python
"""FLOPs / cost analysis of the flagship compute paths.

Replaces the reference's `scripts/flops.py` (torch thop counting) with XLA's
own compiled-graph cost analysis: exact FLOPs and bytes accessed of the jitted
programs that actually run."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(name, fn, *args):
    import jax

    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    bytes_acc = cost.get("bytes accessed", float("nan"))
    print(f"{name:32s} {flops/1e9:10.2f} GFLOP   {bytes_acc/1e6:10.1f} MB accessed")
    return cost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from seeme_tpu.core import synthetic_smpl
    from seeme_tpu.data import SyntheticEgoDataset
    from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem

    B = args.batch_size
    cfg = SeeMeConfig()
    smpl = synthetic_smpl(n_verts=6890)
    data = SyntheticEgoDataset(num_samples=B, motion_length=60,
                               scene_points=cfg.scene_points)
    system = SeeMeSystem(cfg, smpl, data.mean, data.std)
    params = system.init_params(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in next(data.batches(B, shuffle=False)).items()}

    d = cfg.latent_dim[-1]
    analyze("denoiser fwd (1 DDIM step)",
            lambda p, s, t, c: system.denoiser.apply(p, s, t, c),
            params["denoiser"], jnp.zeros((B, 1, d)),
            jnp.zeros((B,), jnp.int32), jnp.zeros((B, 2, d)))
    analyze("vae encode",
            lambda p, f: system.vae.apply(p, f, method=system.vae.encode),
            params["vae"], jnp.zeros((B, 60, cfg.nfeats)))
    analyze("vae decode",
            lambda p, z: system.vae.apply(p, z, 60, method=system.vae.decode),
            params["vae"], jnp.zeros((B, 1, d)))
    analyze("scene pointnet (20k pts)",
            lambda p, s: system.scene_encoder.apply(p, s),
            params["scene_encoder"], batch["scene"])
    analyze("full sample (DDIM-50 + decode)",
            lambda p, b, r: system.sample(p, b, r),
            params, batch, jax.random.PRNGKey(0))
    analyze("diffusion train step loss",
            lambda p, b, r: system.diffusion_loss(p, b, r)[0],
            params, batch, jax.random.PRNGKey(0))


if __name__ == "__main__":
    main()
