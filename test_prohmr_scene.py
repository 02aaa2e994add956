#!/usr/bin/env python
"""Standalone ProHMR-Scene evaluation CLI.

Mirrors `EgoHMR/test_prohmr_scene.py:1-434`: runs the flow's mode prediction
(z=0) over the test split and reports MPJPE / PA-MPJPE (global & pelvis-
aligned) and V2V in mm, like the reference's printout.
"""

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

    import jax
    import jax.numpy as jnp
    import numpy as np

    from seeme_tpu.core.smpl import smpl_forward, synthetic_smpl
    from seeme_tpu.data.batch import eval_batches
    from seeme_tpu.data.egohmr_images import EgoHmrImageDataModule
    from seeme_tpu.eval.t2m_metrics import procrustes_align
    from seeme_tpu.models.prohmr import ProHMRConfig, ProHMRScene
    from seeme_tpu.train.checkpoint import restore_params

    cfg = ProHMRConfig(num_test_samples=1, **(
        dict(flow_hidden=128, flow_depth=1) if args.tiny else {}))  # mode-only eval
    smpl = synthetic_smpl(n_verts=256 if args.tiny else 6890)
    model = ProHMRScene(cfg, smpl)
    dm = EgoHmrImageDataModule(root=args.data_root, n_pts=args.scene_points,
                               img_size=64 if args.tiny else 224, smpl=smpl)

    params = model.init_params(jax.random.PRNGKey(0))
    if args.checkpoint:
        params = restore_params(args.checkpoint, params)
        print(f"loaded {args.checkpoint}")
    else:
        print("no checkpoint — evaluating random init")

    @jax.jit
    def eval_step(params, batch, rng):
        out = model.forward_step(params, batch, rng, train=False)
        sp = batch["smpl_params"]
        gt = smpl_forward(model.smpl, sp["betas"], sp["body_pose"], sp["global_orient"])
        return (
            out["pred_keypoints_3d"][:, 0, :24],
            out["pred_vertices"][:, 0],
            gt["joints"][:, :24],
            gt["vertices"],
        )

    mpjpe_all, pampjpe_all, v2v_all = [], [], []
    rng = jax.random.PRNGKey(1)
    for batch_np, n_valid in eval_batches(dm, "test", args.batch_size):
        batch = {k: jax.tree.map(jnp.asarray, v) for k, v in batch_np.items()}
        rng, step_rng = jax.random.split(rng)
        pred_j, pred_v, gt_j, gt_v = eval_step(params, batch, step_rng)
        pred_j, pred_v = np.asarray(pred_j)[:n_valid], np.asarray(pred_v)[:n_valid]
        gt_j, gt_v = np.asarray(gt_j)[:n_valid], np.asarray(gt_v)[:n_valid]
        # pelvis-aligned MPJPE (mm)
        pa = pred_j - pred_j[:, :1]
        ga = gt_j - gt_j[:, :1]
        mpjpe_all.extend(np.linalg.norm(pa - ga, axis=-1).mean(-1) * 1000)
        pampjpe_all.extend(
            np.linalg.norm(procrustes_align(pred_j[b], gt_j[b]) - gt_j[b], axis=-1).mean()
            * 1000
            for b in range(len(pred_j))
        )
        v2v_all.extend(
            np.linalg.norm(
                (pred_v - pred_j[:, :1]) - (gt_v - gt_j[:, :1]), axis=-1
            ).mean(-1) * 1000
        )

    print(f"MPJPE:    {np.mean(mpjpe_all):.2f} mm")
    print(f"PA-MPJPE: {np.mean(pampjpe_all):.2f} mm")
    print(f"V2V:      {np.mean(v2v_all):.2f} mm")


if __name__ == "__main__":
    main()
