#!/usr/bin/env python
"""Standalone ProHMR-Scene training CLI.

Mirrors `EgoHMR/train_prohmr_scene.py:1-218`: alternating generator /
discriminator AdamW steps (G: keypoint + v2v + NLL + ortho + param +
adversarial losses; D: LSGAN real/fake on body pose rotmats + betas,
`prohmr_scene.py:413-462`), ActNorm data-dependent init on the first batch
(`prohmr_scene.py:82-97`), both steps jit-compiled.
"""

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
    ap.add_argument("--out", default="experiments/prohmr/run")
    ap.add_argument("--tiny", action="store_true",
                    help="small flow/smpl for smoke runs (remote compile of the "
                         "full-size G-step graph takes ~15min on the axon tunnel)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the host CPU backend (conv-heavy graphs "
                         "remote-compile very slowly through the axon tunnel)")
    ap.add_argument("--augment", dest="augment", action="store_true",
                    default=True,
                    help="train-split crop/rotate/flip/color augmentation "
                         "(EgoHMR/dataloaders/augmentation.py; default on, "
                         "as the reference train split)")
    ap.add_argument("--no-augment", dest="augment", action="store_false")
    ap.add_argument("--mocap", default="data/datasets/cmu_mocap.npz",
                    help="CMU-MoCap npz feeding the discriminator's real "
                         "poses (train_prohmr_scene.py:84-86); synthetic "
                         "fallback when absent")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from seeme_tpu.core.rotations import aa_to_rotmat, rotmat_to_rot6d
    from seeme_tpu.core.smpl import synthetic_smpl, load_smpl
    from seeme_tpu.data.augmentation import MoCapDataset
    from seeme_tpu.data.egohmr_images import EgoHmrImageDataModule
    from seeme_tpu.models.prohmr import ProHMRConfig, ProHMRScene
    from seeme_tpu.train.checkpoint import save_params

    if args.tiny:
        cfg = ProHMRConfig(flow_hidden=128, flow_depth=1, num_train_samples=2)
        smpl = synthetic_smpl(n_verts=256)
    else:
        cfg = ProHMRConfig()
        smpl = synthetic_smpl(n_verts=6890)
    model = ProHMRScene(cfg, smpl)
    dm = EgoHmrImageDataModule(root=args.data_root, n_pts=args.scene_points,
                               img_size=64 if args.tiny else 224, smpl=smpl)
    if dm.is_synthetic:
        print("no processed_images found -> synthetic data")

    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)

    # ActNorm warmup on the first batch's GT poses (`prohmr_scene.py:82-97`)
    first = next(dm.batches("train", args.batch_size, shuffle=False))
    first = {k: jax.tree.map(jnp.asarray, v) for k, v in first.items()}
    sp = first["smpl_params"]
    B = sp["betas"].shape[0]
    gt6d = jnp.concatenate(
        [
            rotmat_to_rot6d(aa_to_rotmat(sp["global_orient"]).reshape(B, 1, 3, 3), "prohmr"),
            rotmat_to_rot6d(aa_to_rotmat(sp["body_pose"].reshape(B, 23, 3)), "prohmr"),
        ],
        axis=1,
    ).reshape(B, -1)
    ctx = model.conditioning_features(params, first)
    params = model.initialize_actnorm(params, gt6d, ctx)
    print("ActNorm initialized on first batch")

    gen_keys = ("backbone", "scene_enc", "flow", "fc_head")
    opt_g = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_d = optax.adamw(args.lr, weight_decay=args.weight_decay)
    g_params = {k: params[k] for k in gen_keys}
    d_params = params["discriminator"]
    g_state = opt_g.init(g_params)
    d_state = opt_d.init(d_params)
    adv_w = cfg.loss_weights["ADVERSARIAL"]

    @jax.jit
    def g_step(g_params, d_params, g_state, batch, rng):
        def loss_fn(gp):
            full = dict(gp, discriminator=d_params)
            r1, r2 = jax.random.split(rng)
            out = model.forward_step(full, batch, r1, train=True)
            loss, terms = model.compute_loss(full, batch, out, r2, train=True)
            B, NS = out["body_pose"].shape[:2]
            disc = model.discriminator_outputs(
                full, out["body_pose"].reshape(B * NS, 23, 3, 3),
                out["betas"].reshape(B * NS, 10),
            )
            loss_adv = jnp.sum((disc - 1.0) ** 2) / B
            terms["loss_gen"] = loss_adv
            fake = (
                jax.lax.stop_gradient(out["body_pose"].reshape(B * NS, 23, 3, 3)),
                jax.lax.stop_gradient(out["betas"].reshape(B * NS, 10)),
            )
            return loss + adv_w * loss_adv, (terms, fake)

        (loss, (terms, fake)), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_state = opt_g.update(grads, g_state, g_params)
        return optax.apply_updates(g_params, updates), g_state, terms, fake

    # unpaired CMU-MoCap poses are the discriminator's 'real' distribution
    # (`train_prohmr_scene.py:84-86, 115-135`)
    mocap = MoCapDataset(args.mocap)
    if mocap.is_synthetic:
        print(f"no mocap npz at {args.mocap} -> synthetic discriminator poses")
    mocap_iter = mocap.batches(args.batch_size * cfg.num_train_samples,
                               np.random.RandomState(3))

    @jax.jit
    def d_step(d_params, d_state, mocap_batch, fake):
        gt_pose = aa_to_rotmat(mocap_batch["body_pose"].reshape(-1, 23, 3))
        gt_betas = mocap_batch["betas"]

        def loss_fn(dp):
            full = {"discriminator": dp}
            d_fake = model.discriminator_outputs(full, *fake)
            d_real = model.discriminator_outputs(full, gt_pose, gt_betas)
            loss = (
                jnp.sum(d_fake**2) / d_fake.shape[0]
                + jnp.sum((d_real - 1.0) ** 2) / d_real.shape[0]
            )
            return adv_w * loss

        loss, grads = jax.value_and_grad(loss_fn)(d_params)
        updates, d_state = opt_d.update(grads, d_state, d_params)
        return optax.apply_updates(d_params, updates), d_state, loss

    rng = jax.random.PRNGKey(1)
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        losses = []
        for batch_np in dm.batches("train", args.batch_size, seed=epoch,
                                   augment=args.augment):
            batch = {k: jax.tree.map(jnp.asarray, v) for k, v in batch_np.items()}
            rng, step_rng = jax.random.split(rng)
            g_params, g_state, terms, fake = g_step(g_params, d_params, g_state, batch, step_rng)
            mocap_batch = {k: jnp.asarray(v) for k, v in next(mocap_iter).items()}
            d_params, d_state, d_loss = d_step(d_params, d_state, mocap_batch, fake)
            losses.append(float(terms["loss"]))
        print(
            f"epoch {epoch}: G loss {np.mean(losses):.4f} "
            f"D loss {float(d_loss):.5f} ({time.perf_counter() - t0:.1f}s)"
        )

    final = dict(g_params, discriminator=d_params)
    save_params(f"{args.out}/params", final)
    print(f"saved {args.out}/params")


if __name__ == "__main__":
    main()
