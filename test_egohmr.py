#!/usr/bin/env python
"""Standalone EgoHMR evaluation CLI.

Mirrors `EgoHMR/test_egohmr.py:1-756`: respaced ancestral sampling with
visibility-guided cond/uncond fusion, reporting MPJPE / PA-MPJPE / V2V plus
the visible/invisible-joint split the reference prints."""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--scene_points", type=int, default=1024)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from seeme_tpu.core.smpl import smpl_forward, synthetic_smpl
    from seeme_tpu.data.batch import eval_batches
    from seeme_tpu.data.egohmr_images import EgoHmrImageDataModule
    from seeme_tpu.eval.t2m_metrics import procrustes_align
    from seeme_tpu.models.egohmr import EgoHmr, EgoHmrConfig
    from seeme_tpu.train.checkpoint import restore_params

    if args.tiny:
        cfg = EgoHmrConfig(gcn_hid_dim=128, gcn_layers=1,
                           num_train_timesteps=100, timestep_respacing="ddim10")
        smpl = synthetic_smpl(n_verts=256)
        img_size = 64
    else:
        cfg = EgoHmrConfig()
        smpl = synthetic_smpl(n_verts=6890)
        img_size = 224

    model = EgoHmr(cfg, smpl)
    dm = EgoHmrImageDataModule(root=args.data_root, n_pts=args.scene_points,
                               img_size=img_size, smpl=smpl)
    params = model.init_params(jax.random.PRNGKey(0))
    if args.checkpoint:
        params = restore_params(args.checkpoint, params)
        print(f"loaded {args.checkpoint}")
    else:
        print("no checkpoint — evaluating random init")

    @jax.jit
    def eval_step(params, batch, rng):
        out = model.sample(params, batch, rng, eval_with_uncond=True)
        sp = batch["smpl_params"]
        gt = smpl_forward(model.smpl, sp["betas"], sp["body_pose"], sp["global_orient"])
        return (out["pred_keypoints_3d"][:, :24], out["pred_vertices"],
                gt["joints"][:, :24], gt["vertices"], out["vis_mask_smpl"])

    sums = {k: [] for k in ("MPJPE", "PA-MPJPE", "V2V", "MPJPE-vis", "MPJPE-invis")}
    rng = jax.random.PRNGKey(1)
    for batch_np, n_valid in eval_batches(dm, "test", args.batch_size):
        batch = {k: jax.tree.map(jnp.asarray, v) for k, v in batch_np.items()}
        rng, step_rng = jax.random.split(rng)
        pj, pv, gj, gv, vis = (
            np.asarray(a)[:n_valid]
            for a in eval_step(params, batch, step_rng))
        pa = pj - pj[:, :1]
        ga = gj - gj[:, :1]
        err = np.linalg.norm(pa - ga, axis=-1) * 1000  # (B, 24) mm
        sums["MPJPE"].extend(err.mean(-1))
        for b in range(len(pj)):
            sums["PA-MPJPE"].append(
                np.linalg.norm(procrustes_align(pj[b], gj[b]) - gj[b], axis=-1).mean() * 1000
            )
            if vis[b].any():
                sums["MPJPE-vis"].append(err[b][vis[b]].mean())
            if (~vis[b]).any():
                sums["MPJPE-invis"].append(err[b][~vis[b]].mean())
        sums["V2V"].extend(
            np.linalg.norm((pv - pj[:, :1]) - (gv - gj[:, :1]), axis=-1).mean(-1) * 1000
        )

    for k, v in sums.items():
        if v:
            print(f"{k}: {np.mean(v):.2f} mm")


if __name__ == "__main__":
    main()
