#!/usr/bin/env python
"""Standalone scene-encoding demo (the reference's `scene_encoder.py:1-117`):
loads the frozen ProHMR scene PointNet and encodes one point cloud."""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pcd", default=None, help="(N, 3) npy point cloud; random if absent")
    ap.add_argument("--checkpoint", default=None, help="converted ProHMR params")
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from seeme_tpu.nn.pointnet import ResnetPointnet

    enc = ResnetPointnet(out_dim=512, hidden_dim=256)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 3)))
    if args.checkpoint:
        from seeme_tpu.train.checkpoint import restore_params

        full = restore_params(args.checkpoint, {"scene_enc": params})
        params = full["scene_enc"]
        print(f"loaded scene encoder from {args.checkpoint}")

    if args.pcd:
        pcd = np.load(args.pcd).astype(np.float32).reshape(1, -1, 3)
    else:
        pcd = np.random.RandomState(0).randn(1, args.points, 3).astype(np.float32)
        print(f"no --pcd given: random cloud ({args.points} pts)")

    feats = enc.apply(params, jnp.asarray(pcd))
    print(f"scene embedding: shape {feats.shape}, norm {float(jnp.linalg.norm(feats)):.3f}")


if __name__ == "__main__":
    main()
