#!/usr/bin/env python
"""Demo CLI: sample motions from a trained model and export npy/video.

The reference `demo.py` supports text-file-driven and reconstruction modes
with npy export + optional render; this mirrors that surface for the ego
pipeline (conditions come from the test split) and the text pipeline
(captions from --text / --example file)."""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--cfg_assets", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num_samples", type=int, default=4)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--mesh", action="store_true",
                    help="also export sample_{i}_mesh.npy SMPL vertex "
                         "sequences (full LBS) for render.py --mesh")
    ap.add_argument("--example", default=None, help="text file with one caption per line")
    args = ap.parse_args()

    import jax
    import numpy as np

    from seeme_tpu.config import load_config
    from seeme_tpu.config.build import build_system
    from seeme_tpu.data import get_datamodule
    from seeme_tpu.train.checkpoint import restore_params

    cfg = load_config(args.cfg, args.cfg_assets)
    datamodule = get_datamodule(cfg)
    system, sys_cfg = build_system(cfg, datamodule.mean, datamodule.std)
    params = system.init_params(jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234))))
    ckpt = args.checkpoint or str(cfg.select("TEST.CHECKPOINTS", "") or "")
    if ckpt and os.path.exists(ckpt):
        params = restore_params(ckpt, params)
        print(f"loaded {ckpt}")
    else:
        print("no checkpoint — sampling from random init")

    os.makedirs(args.out, exist_ok=True)
    rng = jax.random.PRNGKey(0)
    batch_np = next(datamodule.batches("test", args.num_samples, shuffle=False))
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
    out = jax.jit(lambda p, b, r: system.eval_outputs(p, b, r))(params, batch, rng)

    joints = np.asarray(out["joints_rst"])
    joints_gt = np.asarray(out["joints_ref"])
    for i in range(args.num_samples):
        np.save(os.path.join(args.out, f"sample_{i}.npy"), joints[i])
        np.save(os.path.join(args.out, f"gt_{i}.npy"), joints_gt[i])
    print(f"saved {args.num_samples} samples to {args.out}/")

    if args.mesh:
        # full-LBS vertices for the mesh-render pipeline (the reference gets
        # these via fit.py -> *_mesh.npy; the ego features ARE SMPL params,
        # so vertices come straight from smpl_forward)
        from seeme_tpu.models.seeme import WEARER

        actor = WEARER if sys_cfg.estimate == "wearer" else 1 - WEARER
        raw_rst = system.renorm(out["feats_rst"])
        betas = batch["betas"][:, actor]
        transl = None if sys_cfg.predict_transl else batch["transl"][:, actor]
        verts = np.asarray(jax.jit(system.feats_to_vertices)(
            raw_rst, betas, transl))
        for i in range(args.num_samples):
            np.save(os.path.join(args.out, f"sample_{i}_mesh.npy"), verts[i])
        np.save(os.path.join(args.out, "faces.npy"), system.smpl.faces)
        print(f"saved {args.num_samples} mesh npys (+faces.npy)")

    if args.render:
        from seeme_tpu.render.joints import render_joints_video

        for i in range(args.num_samples):
            path = render_joints_video(
                joints[i], os.path.join(args.out, f"sample_{i}.gif"),
                gt_joints=joints_gt[i], title=f"sample {i}",
            )
            print(f"rendered {path}")


if __name__ == "__main__":
    main()
