#!/usr/bin/env python
"""Demo CLI: sample motions from a trained model and export npy/video.

Mirrors the reference `demo.py:25-332` surface with dataset dispatch like
`test.py`:
  * ego configs (egobody/gimo): sample the wearer from test-split conditions,
    optional SMPL mesh export + joints render.
  * text configs (humanml3d/kit): caption-driven sampling from an --example
    file ("<length> <caption>" per line, `mld/utils/demo_utils.py:6-20`),
    test-split captions by default, --task random_sampling for prior-latent
    decoding, --task reconstruction for VAE round-trips.
  * action configs (humanact12/uestc): class-conditional sampling via
    --actions.
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--cfg_assets", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num_samples", type=int, default=4)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--mesh", action="store_true",
                    help="(ego) also export sample_{i}_mesh.npy SMPL vertex "
                         "sequences (full LBS) for render.py --mesh")
    ap.add_argument("--example", default=None,
                    help="text file, one '<length> <caption>' per line "
                         "(plain caption lines get --length)")
    ap.add_argument("--task", default=None,
                    choices=["text_motion", "random_sampling",
                             "reconstruction"],
                    help="text-config mode when no --example is given")
    ap.add_argument("--length", type=int, default=None,
                    help="default motion length for caption lines without one")
    ap.add_argument("--actions", default=None,
                    help="comma-separated class ids for action configs "
                         "(default: first num_samples classes)")
    ap.add_argument("--replication", type=int, default=1,
                    help="samples per caption/action (`cfg.DEMO.REPLICATION`)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (applied after jax import; "
                         "the axon plugin overrides JAX_PLATFORMS)")
    return ap.parse_args()


def load_example_input(txt_path, default_len):
    """Reference example-file format (`mld/utils/demo_utils.py:6-20`):
    '<length> <caption...>' per line; tolerate plain caption lines."""
    texts, lens = [], []
    with open(txt_path) as f:
        for raw in f:
            s = raw.strip()
            if not s:
                continue
            head = s.split(" ")[0]
            try:
                lens.append(int(head))
                texts.append(s[len(head) + 1:])
            except ValueError:
                lens.append(default_len)
                texts.append(s)
    return texts, lens


def _render_all(paths, out_dir):
    from seeme_tpu.render.joints import render_joints_video
    import numpy as np

    for p in paths:
        joints = np.load(p)
        gif = render_joints_video(
            joints, p.replace(".npy", ".gif"),
            title=os.path.basename(p)[:-4])
        print(f"rendered {gif}")


def _demo_text(args, cfg, datamodule):
    """Text-to-motion demo (`demo.py:101-260` text2motion / random /
    reconstruction modes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seeme_tpu.config.build import build_t2m_system
    from seeme_tpu.data.batch import eval_batches
    from seeme_tpu.train.checkpoint import resolve_latest, restore_params

    system, sys_cfg = build_t2m_system(cfg, datamodule)
    params = system.init_params(
        jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234))))
    ckpt = args.checkpoint or str(cfg.select("TEST.CHECKPOINTS", "") or "")
    # configs point at ".../checkpoints/latest" (no literal dir on disk):
    # resolve to the highest numeric step dir, matching test.py/train.py
    ckpt = resolve_latest(ckpt) if ckpt else ckpt
    if ckpt and os.path.exists(ckpt):
        params = restore_params(ckpt, params)
        print(f"loaded {ckpt}")
    else:
        print("no checkpoint — sampling from random init")

    default_len = args.length or int(cfg.select("DATASET.SAMPLER.MAX_LEN", 196))
    task = args.task or "text_motion"
    rng = jax.random.PRNGKey(0)
    saved = []

    if task == "reconstruction" and args.example is None:
        # VAE round-trip of test motions (`demo.py` reconstruction branch)
        recon = jax.jit(lambda p, b, r: system.reconstruct(p, b, r))
        batch_np, n_valid = next(eval_batches(datamodule, "test", args.num_samples))
        batch_np.pop("text", None)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        feats_rst = recon(params, batch, rng)
        joints = np.asarray(datamodule.feats2joints(feats_rst))
        joints_gt = np.asarray(datamodule.feats2joints(batch["motion"]))
        # eval_batches pads a short split by repeating the tail row — only
        # the first n_valid outputs are distinct samples
        for i in range(min(args.num_samples, n_valid)):
            L = int(batch_np["length"][i])
            for name, arr in (("rec", joints[i, :L]), ("gt", joints_gt[i, :L])):
                p = os.path.join(args.out, f"{name}_{i}.npy")
                np.save(p, arr)
                saved.append(p)
        return saved

    if task == "random_sampling" and args.example is None:
        # latent-prior sampling: z ~ N(0, 1) decoded by the VAE
        z = jax.random.normal(
            rng, (args.num_samples,) + tuple(sys_cfg.latent_dim))
        lengths = jnp.full((args.num_samples,), default_len, jnp.int32)
        feats = system.vae.apply(params["vae"], z, sys_cfg.max_len, lengths,
                                 method=system.vae.decode)
        joints = np.asarray(datamodule.feats2joints(feats))
        for i in range(args.num_samples):
            p = os.path.join(args.out, f"random_{i}.npy")
            np.save(p, joints[i, :default_len])
            saved.append(p)
        return saved

    # caption-driven sampling: --example file, else test-split captions
    if args.example:
        texts, lens = load_example_input(args.example, default_len)
    else:
        batch_np, n_valid = next(eval_batches(datamodule, "test", args.num_samples))
        n_take = min(args.num_samples, n_valid)  # pad rows are tail duplicates
        texts = list(batch_np.get("text", []))[:n_take]
        lens = [int(x) for x in batch_np["length"][:n_take]]
        if not texts:
            raise SystemExit(
                "dataset provides no captions; pass --example captions.txt")
    text_emb = jnp.asarray(system.text_encoder(texts))
    tmask = system.text_encoder.token_mask(texts)
    cond_mask = None if tmask is None else jnp.asarray(tmask)
    lengths = jnp.asarray(np.array(lens, np.int32))
    sample = jax.jit(lambda p, t, r: system.sample(
        p, t, r, lengths=lengths, cond_mask=cond_mask))
    with open(os.path.join(args.out, "captions.txt"), "w") as f:
        for L, t in zip(lens, texts):
            f.write(f"{L} {t}\n")
    for rep in range(args.replication):
        rng, sr = jax.random.split(rng)
        feats = sample(params, text_emb, sr)
        joints = np.asarray(datamodule.feats2joints(feats))
        for i, (L, text) in enumerate(zip(lens, texts)):
            suffix = f"_{rep}" if args.replication > 1 else ""
            p = os.path.join(args.out, f"sample_{i}{suffix}.npy")
            np.save(p, joints[i, :L])
            saved.append(p)
            print(f"[{i}] len={L} {text!r} -> {p}")
    return saved


def _demo_action(args, cfg, datamodule):
    """Action-to-motion demo: class-conditional sampling + FK to joints."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seeme_tpu.config.build import build_a2m_system, load_smpl_or_synthetic
    from seeme_tpu.train.checkpoint import resolve_latest, restore_params

    system, sys_cfg = build_a2m_system(cfg, datamodule)
    params = system.init_params(
        jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234))))
    ckpt = args.checkpoint or str(cfg.select("TEST.CHECKPOINTS", "") or "")
    # configs point at ".../checkpoints/latest" (no literal dir on disk):
    # resolve to the highest numeric step dir, matching test.py/train.py
    ckpt = resolve_latest(ckpt) if ckpt else ckpt
    if ckpt and os.path.exists(ckpt):
        params = restore_params(ckpt, params)
        print(f"loaded {ckpt}")
    else:
        print("no checkpoint — sampling from random init")

    if args.actions:
        action_ids = [int(x) for x in args.actions.split(",")]
    else:
        action_ids = list(range(min(args.num_samples, sys_cfg.num_classes)))
    labels = jnp.asarray(np.array(action_ids, np.int32))
    smpl = load_smpl_or_synthetic(cfg)
    sample = jax.jit(lambda p, a, r: system.sample(p, a, r))
    fk = jax.jit(lambda f: system.feats_to_joints(smpl, f))

    rng = jax.random.PRNGKey(0)
    saved = []
    names = getattr(datamodule, "action_names", None)
    for rep in range(args.replication):
        rng, sr = jax.random.split(rng)
        feats = sample(params, labels, sr)
        joints = np.asarray(fk(feats))
        for i, a in enumerate(action_ids):
            label = names[a] if names and a < len(names) else str(a)
            suffix = f"_{rep}" if args.replication > 1 else ""
            p = os.path.join(args.out, f"action_{a}{suffix}.npy")
            np.save(p, joints[i])
            saved.append(p)
            print(f"action {a} ({label}) -> {p}")
    return saved


def _demo_ego(args, cfg, datamodule):
    """Ego demo: wearer sampling from test-split conditions (+ mesh export)."""
    import jax
    import numpy as np

    from seeme_tpu.config.build import build_system
    from seeme_tpu.data.batch import eval_batches
    from seeme_tpu.train.checkpoint import resolve_latest, restore_params

    system, sys_cfg = build_system(cfg, datamodule.mean, datamodule.std)
    params = system.init_params(
        jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234))))
    ckpt = args.checkpoint or str(cfg.select("TEST.CHECKPOINTS", "") or "")
    # configs point at ".../checkpoints/latest" (no literal dir on disk):
    # resolve to the highest numeric step dir, matching test.py/train.py
    ckpt = resolve_latest(ckpt) if ckpt else ckpt
    if ckpt and os.path.exists(ckpt):
        params = restore_params(ckpt, params)
        print(f"loaded {ckpt}")
    else:
        print("no checkpoint — sampling from random init")

    rng = jax.random.PRNGKey(0)
    batch_np, n_valid = next(eval_batches(datamodule, "test", args.num_samples))
    # eval_batches pads a short split by repeating the tail row — only the
    # first n_valid rows are distinct samples
    n_take = min(args.num_samples, n_valid)
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
    out = jax.jit(lambda p, b, r: system.eval_outputs(p, b, r))(
        params, batch, rng)

    joints = np.asarray(out["joints_rst"])
    joints_gt = np.asarray(out["joints_ref"])
    saved = []
    for i in range(n_take):
        p = os.path.join(args.out, f"sample_{i}.npy")
        np.save(p, joints[i])
        np.save(os.path.join(args.out, f"gt_{i}.npy"), joints_gt[i])
        saved.append(p)
    print(f"saved {n_take} samples to {args.out}/")

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
        for i in range(n_take):
            np.save(os.path.join(args.out, f"sample_{i}_mesh.npy"), verts[i])
        np.save(os.path.join(args.out, "faces.npy"), system.smpl.faces)
        print(f"saved {n_take} mesh npys (+faces.npy)")

    if args.render:
        from seeme_tpu.render.joints import render_joints_video

        for i in range(n_take):
            path = render_joints_video(
                joints[i], os.path.join(args.out, f"sample_{i}.gif"),
                gt_joints=joints_gt[i], title=f"sample {i}",
            )
            print(f"rendered {path}")
        return []
    return saved


def main():
    args = parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from seeme_tpu.config import load_config
    from seeme_tpu.data import get_datamodule

    cfg = load_config(args.cfg, args.cfg_assets)
    datamodule = get_datamodule(cfg)
    os.makedirs(args.out, exist_ok=True)

    name = str(cfg.get("DATASET_NAME"))
    if name in ("humanml3d", "kit"):
        saved = _demo_text(args, cfg, datamodule)
    elif name in ("humanact12", "uestc"):
        saved = _demo_action(args, cfg, datamodule)
    else:
        saved = _demo_ego(args, cfg, datamodule)

    if args.render and saved:
        _render_all(saved, args.out)


if __name__ == "__main__":
    main()
