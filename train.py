#!/usr/bin/env python
"""Training CLI.

Same surface as the reference `train.py`:
    python -m train --cfg configs/config_mld_egobody.yaml \
                    [--cfg_assets configs/assets.yaml] [--batch_size N] [--nodebug]

Differences are TPU-native: instead of a Lightning Trainer + DDP
(`train.py:127-190` in the reference), one jitted train step runs over a
jax.sharding Mesh with the batch on the 'data' axis; checkpoints are orbax
under the reference's experiment-folder layout with the same resume-by-scan UX.
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--cfg_assets", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--nodebug", action="store_true")
    p.add_argument("--device", default=None, help="unused on TPU; kept for CLI parity")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this applies jax.config after import)")
    p.add_argument("opts", nargs="*", default=[],
                   help="dotted config overrides, e.g. TRAIN.END_EPOCH=5")
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from seeme_tpu.config import load_config, save_config
    from seeme_tpu.config.build import build_system
    from seeme_tpu.data import get_datamodule
    from seeme_tpu.data.batch import eval_batches
    from seeme_tpu.parallel import make_mesh
    from seeme_tpu.train import (
        create_train_state,
        make_optimizer,
        make_scan_train_step,
        make_train_step,
        run_epoch,
    )
    from seeme_tpu.train.checkpoint import (
        load_pretrained_vae,
        make_manager,
        normalize_resume_dir,
        restore_state,
        resume_scan,
        save_state,
    )
    from seeme_tpu.utils.logger import (
        TensorBoardWriter,
        WandbLogger,
        create_experiment_dir,
        create_logger,
    )

    from seeme_tpu.config.loader import parse_dotted_overrides

    overrides = parse_dotted_overrides(args.opts)
    if args.batch_size is not None:
        overrides.setdefault("TRAIN", {})["BATCH_SIZE"] = args.batch_size
    cfg = load_config(args.cfg, args.cfg_assets, overrides=overrides)
    if args.nodebug:
        cfg["DEBUG"] = False
    if args.epochs is not None:
        cfg["TRAIN"]["END_EPOCH"] = args.epochs

    exp_dir = create_experiment_dir(cfg)
    logger = create_logger(exp_dir)
    save_config(cfg, os.path.join(exp_dir, "config.yaml"))
    tb = TensorBoardWriter(exp_dir, enabled=bool(cfg.select("LOGGER.TENSORBOARD", True)))
    wb = WandbLogger(cfg, exp_dir)

    stage = str(cfg.TRAIN.STAGE)
    seed = int(cfg.get("SEED_VALUE", 1234))
    datamodule = get_datamodule(cfg)
    if getattr(datamodule, "is_synthetic", False):
        logger.info("dataset release not found -> synthetic datamodule")

    is_t2m = cfg.get("DATASET_NAME") in ("humanml3d", "kit")
    is_a2m = cfg.get("DATASET_NAME") in ("humanact12", "uestc")
    if is_t2m:
        from seeme_tpu.config.build import build_t2m_system

        system, sys_cfg = build_t2m_system(cfg, datamodule)
    elif is_a2m:
        from seeme_tpu.config.build import build_a2m_system

        system, sys_cfg = build_a2m_system(cfg, datamodule)
    else:
        system, sys_cfg = build_system(cfg, datamodule.mean, datamodule.std)
    params = system.init_params(jax.random.PRNGKey(seed))

    pretrained_vae = str(cfg.select("TRAIN.PRETRAINED_VAE", "") or "")
    if stage == "diffusion" and pretrained_vae:
        from seeme_tpu.train.checkpoint import resolve_latest

        # the configs point at "checkpoints/latest": resolve to the highest
        # numeric step dir (the reference resolves resume checkpoints the
        # same scan-the-directory way, `train.py:26-53`)
        pretrained_vae = resolve_latest(pretrained_vae)
        if os.path.exists(pretrained_vae):
            params = load_pretrained_vae(pretrained_vae, params)
            logger.info("loaded pretrained VAE from %s", pretrained_vae)
        else:
            # a silent skip here trains stage 2 against a FROZEN RANDOM
            # VAE — the run "converges" on noise-MSE but samples garbage
            logger.warning(
                "TRAIN.PRETRAINED_VAE=%s does not exist — stage-2 training "
                "will freeze a randomly initialized VAE", pretrained_vae)

    batch_size = int(cfg.TRAIN.BATCH_SIZE)
    end_epoch = int(cfg.TRAIN.END_EPOCH)

    n_train = getattr(datamodule, "num_train", None) or (
        len(datamodule.train_set) if hasattr(datamodule, "train_set") else batch_size
    )
    if 0 < n_train < batch_size:
        # drop_last batching would yield ZERO steps per epoch — training
        # would silently no-op (e.g. DEBUG-truncated splits with the
        # config's full batch size). Clamp so every epoch trains.
        logger.warning(
            "TRAIN.BATCH_SIZE %d exceeds the train split (%d samples) — "
            "clamping batch size to %d so each epoch has at least one step",
            batch_size, n_train, n_train)
        batch_size = n_train
    steps_per_epoch = max(n_train // batch_size, 1)

    optimizer = make_optimizer(
        stage,
        params,
        lr=float(cfg.TRAIN.OPTIM.LR),
        step_size_epochs=int(cfg.select("TRAIN.OPTIM.STEP_SIZE", end_epoch)),
        gamma=float(cfg.select("TRAIN.OPTIM.GAMMA", 0.2)),
        steps_per_epoch=steps_per_epoch,
    )
    state = create_train_state(params, optimizer, jax.random.PRNGKey(seed + 1))

    start_epoch = 0
    resume = str(cfg.select("TRAIN.RESUME", "") or "")
    if resume:
        # Accept the experiment dir, its `checkpoints/` dir, or a step /
        # `latest` entry under it — all normalize to the experiment dir, so
        # path-spelling variants can't defeat the resuming-here check below.
        resume = normalize_resume_dir(resume)
        # Validate the resume source BEFORE constructing the fresh manager:
        # make_manager(fresh=True) purges step dirs, and a mistyped RESUME
        # must error out rather than delete this experiment's (possibly the
        # resume source's) checkpoints.
        _, latest = resume_scan(resume)
        if latest is None:
            raise FileNotFoundError(
                f"TRAIN.RESUME={resume} has no checkpoint step dirs under "
                f"{os.path.join(resume, 'checkpoints')} — refusing to start "
                "(a fresh start would purge existing checkpoints; unset "
                "TRAIN.RESUME to train from scratch)")
        # a warm start from ANOTHER experiment dir still clears this dir's
        # stale step dirs (orbax silently skips saves below the stale latest
        # step — checkpoint.py); resuming in place must not purge itself
        resuming_here = resume == os.path.abspath(exp_dir)
        manager = make_manager(exp_dir, fresh=not resuming_here)
        state, step = restore_state(make_manager(resume), state)
        start_epoch = step // steps_per_epoch
        logger.info("resumed from %s @ step %d (epoch %d)", resume, step, start_epoch)
    else:
        # a non-resume run must clear stale step dirs in its own experiment
        # dir: orbax silently skips saves below the stale latest step
        manager = make_manager(exp_dir, fresh=True)

    # Stage-2 scene cache: the frozen PointNet is ~90% of the train step
    # (scripts/TRAIN_PROFILE.json: 57 of 64 ms at batch 64) and its output is
    # deterministic per sample, so precompute the (N, 512) features once and
    # slice them into every batch (the datamodule then omits the raw 20k-pt
    # cloud from training batches — ~15 MB/step of dead host->device
    # transfer otherwise). Runs AFTER the resume restore so the features
    # come from the same scene_encoder weights the run trains with. The
    # CFG-training path masks raw points, so the cache only applies at
    # guidance_scale <= 1 (the shipped ego config). Default on-TPU only:
    # the one-core CPU host takes minutes to fill it. The cache covers EVERY
    # frozen encoder (scene PointNet and image ResNet50): control it with
    # the generic TRAIN.FEATURE_CACHE; TRAIN.SCENE_CACHE remains a legacy
    # alias from when the scene encoder was the only cached one.
    cache_feats = cfg.select("TRAIN.FEATURE_CACHE", None)
    if cache_feats is None:
        cache_feats = cfg.select("TRAIN.SCENE_CACHE", None)
    if cache_feats is None:
        cache_feats = jax.default_backend() != "cpu"
    frozen_encoders = []
    if getattr(system, "use_scene", False):
        frozen_encoders.append(("scene", "scene_feats", system.scene_features))
    if getattr(system, "use_image", False):
        # the ResNet50 image backbone is frozen like the PointNet
        # (`mld.py:235-246`); its per-sample features cache the same way
        frozen_encoders.append(("image", "image_feats", system.image_features))
    if (cache_feats and stage != "vae" and frozen_encoders
            and float(getattr(sys_cfg, "guidance_scale", 1.0)) <= 1.0
            and hasattr(datamodule, "attach_split_features")):
        import numpy as np

        for raw_key, feat_key, encode in frozen_encoders:
            feats_fn = jax.jit(lambda p, s, _e=encode: _e(p, s))
            for split in ("train", "val"):
                try:
                    raw = datamodule.split_array(split, raw_key)
                except (AttributeError, KeyError, FileNotFoundError):
                    continue
                chunks = []
                cs = max(batch_size, 8)
                for i in range(0, len(raw), cs):
                    chunk = raw[i:i + cs]
                    pad = cs - len(chunk)
                    if pad:  # fixed-shape jit: pad the tail chunk
                        chunk = np.concatenate(
                            [chunk, np.repeat(chunk[-1:], pad, axis=0)])
                    out = np.asarray(
                        feats_fn(state.params, jax.numpy.asarray(chunk)))
                    chunks.append(out[: cs - pad] if pad else out)
                datamodule.attach_split_features(
                    split, feat_key, np.concatenate(chunks))
                logger.info("precomputed frozen %s features for %s "
                            "(%d samples)", raw_key, split, len(raw))

    mesh = make_mesh(model_axis=int(cfg.select("MESH.MODEL_AXIS", 1)))
    logger.info(
        "stage=%s devices=%d mesh=%s batch=%d steps/epoch=%d",
        stage, len(jax.devices()), dict(zip(mesh.axis_names, mesh.devices.shape)),
        batch_size, steps_per_epoch,
    )
    train_step = make_train_step(system, stage, optimizer, mesh=mesh)

    # k-step dispatch: every jitted call on this box pays a ~32 ms relay
    # round trip and grows host RSS per dispatch (BASELINE.md "Known
    # issue"); scanning k steps inside one call amortizes both by k while
    # training on exactly the same batches (the epoch tail that doesn't
    # fill a group runs through the single-step path). Defaults to 8 on
    # TPU, 1 elsewhere (TRAIN.STEPS_PER_DISPATCH overrides).
    steps_per_dispatch = cfg.select("TRAIN.STEPS_PER_DISPATCH", None)
    if steps_per_dispatch is None:
        steps_per_dispatch = 8 if jax.default_backend() != "cpu" else 1
    steps_per_dispatch = max(int(steps_per_dispatch), 1)
    scan_step = (
        make_scan_train_step(system, stage, optimizer, mesh=mesh)
        if steps_per_dispatch > 1
        else None
    )

    # keys the stage's loss never reads are dropped before the host->device
    # transfer: stage-1 doesn't touch the 20k-pt scene cloud (~15 MB/batch at
    # batch 64) or images, and shipping them anyway costs relay bandwidth and
    # grows host RSS across long runs
    drop_keys = set()
    if stage == "vae":
        drop_keys = {"scene", "image"}
    elif not getattr(system, "use_image", False):
        drop_keys = {"image"}

    # Device-resident train split: the relay leaks host RSS byte-for-byte on
    # every h2d transfer and moves ~21 MB/s (scripts/DISPATCH_PROBE.json),
    # so per-step batch shipping is both the RSS "Known issue" and, with the
    # scene cache, most of the remaining step wall time. When the split fits
    # in HBM, upload it once and gather minibatches on-device from k*B int32
    # indices per dispatch. Identical batch order (data/batch.py::
    # epoch_indices is shared) and identical step math. Inapplicable to
    # image conditioning (host-side crop pick + normalize) and to real-
    # release t2m (host-side caption encoding — its split_arrays raises).
    # TRAIN.DEVICE_DATA=true/false overrides.
    device_data = None
    use_device_data = cfg.select("TRAIN.DEVICE_DATA", None)
    if use_device_data is None:
        use_device_data = jax.default_backend() != "cpu"
    # t2m qualifies only when the datamodule ships precomputed text_emb rows
    # (synthetic set); the real release encodes captions host-side and its
    # split_arrays raises KeyError -> host-batched fallback below
    if (use_device_data
            and hasattr(datamodule, "split_arrays")
            and hasattr(datamodule, "batch_indices")):
        import numpy as np

        from seeme_tpu.parallel import replicated
        from seeme_tpu.train import make_gather_scan_train_step, run_epoch_device

        try:
            arrays = dict(datamodule.split_arrays("train") or {}) or None
        except (AttributeError, KeyError, FileNotFoundError):
            arrays = None
        if arrays is not None:
            for k in set(drop_keys) | {"image_crops", "image"}:
                arrays.pop(k, None)
            if "scene_feats" in arrays:
                arrays.pop("scene", None)
            # raw image crops are host-side work (crop pick + normalize) —
            # the device path serves image configs only through the frozen
            # image_feats cache
            if getattr(system, "use_image", False) and "image_feats" not in arrays:
                arrays = None
        if arrays is not None:
            total_gb = sum(v.nbytes for v in arrays.values()) / 1e9
            max_gb = float(cfg.select("TRAIN.DEVICE_DATA_MAX_GB", 4.0))
            if total_gb <= max_gb:
                rep = replicated(mesh)
                device_data = {
                    k: jax.device_put(jax.numpy.asarray(v), rep)
                    for k, v in arrays.items()
                }
                gather_step = make_gather_scan_train_step(
                    system, stage, optimizer, mesh=mesh)
                logger.info(
                    "device-resident train split: %.3f GB in HBM, "
                    "%d steps/dispatch", total_gb, steps_per_dispatch)
            else:
                logger.info(
                    "device-resident split skipped: %.2f GB > "
                    "TRAIN.DEVICE_DATA_MAX_GB=%.2f", total_gb, max_gb)

    ckpt_every = int(cfg.select("LOGGER.SACE_CHECKPOINT_EPOCH", 200))
    log_every = max(int(cfg.select("LOGGER.LOG_EVERY_STEPS", 1)), 1)

    def data_iter(epoch):
        for b in datamodule.batches("train", batch_size, seed=seed + epoch):
            for k in drop_keys:
                b.pop(k, None)
            if is_t2m:
                texts = b.pop("text", None)
                # host-side caption embedding (frozen CLIP / fallback)
                if "text_emb" not in b and texts is not None:
                    b["text_emb"] = system.text_encoder(texts)
                    tm = system.text_encoder.token_mask(texts)
                    if tm is not None:
                        b["text_mask"] = tm
            yield b

    # validation: loss on the EVAL split every VAL_EVERY_STEPS epochs
    # (the reference's check_val_every_n_epoch, `train.py:139-141`)
    val_every = max(int(cfg.select("LOGGER.VAL_EVERY_STEPS", 200)), 1)
    loss_fn = system.vae_loss if stage == "vae" else system.diffusion_loss
    val_step = jax.jit(lambda p, b, r: loss_fn(p, b, r)[1])

    def validate(state):
        acc, n = {}, 0
        rng = jax.random.PRNGKey(0)
        # eval_batches pads a trailing partial val batch (duplicated tail
        # rows bias the scalar mean slightly — acceptable for a monitoring
        # signal, and it keeps validation working when the val split is
        # smaller than the batch)
        for b, _ in eval_batches(datamodule, "val", batch_size):
            if is_t2m:
                texts = b.pop("text", None)
                if "text_emb" not in b and texts is not None:
                    b["text_emb"] = system.text_encoder(texts)
                    tm = system.text_encoder.token_mask(texts)
                    if tm is not None:
                        b["text_mask"] = tm
            batch = {k: jax.numpy.asarray(v) for k, v in b.items()}
            rng, r = jax.random.split(rng)
            terms = val_step(state.params, batch, r)
            for k, v in terms.items():
                acc[k] = acc.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in acc.items()}

    t_start = time.perf_counter()
    for epoch in range(start_epoch, end_epoch):
        if device_data is not None:
            state, means = run_epoch_device(
                gather_step, state, device_data,
                datamodule.batch_indices("train", batch_size, seed=seed + epoch),
                steps_per_dispatch=steps_per_dispatch, mesh=mesh,
            )
        else:
            state, means = run_epoch(
                train_step, state, data_iter(epoch), mesh=mesh,
                scan_step=scan_step, steps_per_dispatch=steps_per_dispatch,
            )
        if epoch % log_every == 0:
            from seeme_tpu.utils.profiling import memory_stats

            msg = " ".join(f"{k}={v:.5f}" for k, v in sorted(means.items()))
            mem = " ".join(f"{k}={v:.2f}" for k, v in memory_stats().items())
            logger.info("epoch %d/%d %s %s", epoch, end_epoch, msg, mem)
            tb.scalars(int(state.step), means, prefix=f"{stage}/")
            wb.log(int(state.step), means, prefix=f"{stage}/")
        if (epoch + 1) % val_every == 0:
            val_means = validate(state)
            logger.info(
                "val epoch %d %s", epoch,
                " ".join(f"{k}={v:.5f}" for k, v in sorted(val_means.items())),
            )
            tb.scalars(int(state.step), val_means, prefix="val/")
        if (epoch + 1) % ckpt_every == 0 or epoch + 1 == end_epoch:
            save_state(manager, state, int(state.step))
            logger.info("checkpoint @ step %d", int(state.step))

    elapsed = time.perf_counter() - t_start
    logger.info("done: %d epochs in %.1fs", end_epoch - start_epoch, elapsed)
    tb.close()
    wb.finish()


if __name__ == "__main__":
    main()
