#!/usr/bin/env python
"""Standalone EgoHMR (diffusion-GCN) training CLI.

Mirrors `EgoHMR/train_egohmr.py:1-257`: single AdamW over all modules, the
x0-prediction diffusion MSE plus the geometric losses (v2v / keypoints /
parameter / orthogonality) on the denoised outputs."""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--scene_points", type=int, default=1024)
    ap.add_argument("--out", default="experiments/egohmr/run")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--augment", dest="augment", action="store_true",
                    default=True,
                    help="train-split crop/rotate/flip/color augmentation "
                         "(EgoHMR/dataloaders/augmentation.py)")
    ap.add_argument("--no-augment", dest="augment", action="store_false")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from seeme_tpu.core.rotations import aa_to_rotmat, rotmat_to_rot6d
    from seeme_tpu.core.smpl import synthetic_smpl
    from seeme_tpu.data.egohmr_images import EgoHmrImageDataModule
    from seeme_tpu.models.egohmr import EgoHmr, EgoHmrConfig
    from seeme_tpu.train.checkpoint import save_params

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
    if dm.is_synthetic:
        print("no processed_images found -> synthetic data")

    params = model.init_params(jax.random.PRNGKey(0))
    opt = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = opt.init(params)

    def add_body_rep(batch):
        """GT diffusion-layout rot6d, normalized by body_rep stats
        (`train_egohmr.py` builds x_start from the dataset's smpl params)."""
        sp = batch["smpl_params"]
        B = sp["betas"].shape[0]
        full_aa = jnp.concatenate(
            [sp["global_orient"].reshape(B, 1, 3), sp["body_pose"].reshape(B, 23, 3)],
            axis=1,
        )
        r6 = rotmat_to_rot6d(aa_to_rotmat(full_aa), mode="diffusion").reshape(B, 144)
        batch["body_rep"] = (r6 - model.body_rep_mean) / model.body_rep_std
        return batch

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            return model.training_loss(p, batch, rng)

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state_new = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state_new, terms

    rng = jax.random.PRNGKey(1)
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        totals = []
        for batch_np in dm.batches("train", args.batch_size, seed=epoch, augment=args.augment):
            batch = add_body_rep({k: jax.tree.map(jnp.asarray, v) for k, v in batch_np.items()})
            rng, step_rng = jax.random.split(rng)
            params, opt_state, terms = step(params, opt_state, batch, step_rng)
            totals.append(float(terms["total"]))
        print(f"epoch {epoch}: loss {np.mean(totals):.4f} "
              f"(mse {float(terms['diffusion_mse']):.4f}, "
              f"{time.perf_counter() - t0:.1f}s)")

    save_params(f"{args.out}/params", params)
    print(f"saved {args.out}/params")


if __name__ == "__main__":
    main()
