#!/usr/bin/env python
"""Latent-space visualization (the reference's `scripts/tsne.py`).

Encodes motions into VAE latents and projects to 2D (sklearn t-SNE when
available, PCA otherwise), writing a scatter png."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num", type=int, default=128)
    ap.add_argument("--out", default="latents_tsne.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from seeme_tpu.config import load_config
    from seeme_tpu.config.build import build_system
    from seeme_tpu.data import get_datamodule
    from seeme_tpu.train.checkpoint import restore_params

    cfg = load_config(args.cfg)
    dm = get_datamodule(cfg)
    system, sys_cfg = build_system(cfg, dm.mean, dm.std)
    params = system.init_params(jax.random.PRNGKey(0))
    if args.checkpoint:
        params = restore_params(args.checkpoint, params)

    latents = []
    n = 0
    enc = jax.jit(lambda p, f: system.encode_motion_latent(p, f)[0])
    for batch in dm.batches("test", 16, shuffle=False):
        f = system.actor_features({k: jax.numpy.asarray(v) for k, v in batch.items()}, 0)
        latents.append(np.asarray(enc(params["vae"], f)).reshape(len(f), -1))
        n += len(f)
        if n >= args.num:
            break
    z = np.concatenate(latents)[: args.num]

    try:
        from sklearn.manifold import TSNE

        xy = TSNE(n_components=2, init="pca", perplexity=min(30, len(z) - 1)).fit_transform(z)
        method = "t-SNE"
    except Exception:
        z0 = z - z.mean(0)
        _, _, vt = np.linalg.svd(z0, full_matrices=False)
        xy = z0 @ vt[:2].T
        method = "PCA"

    plt.figure(figsize=(5, 5))
    plt.scatter(xy[:, 0], xy[:, 1], s=8)
    plt.title(f"VAE latents ({method}, n={len(z)})")
    plt.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out} ({method})")


if __name__ == "__main__":
    main()
