#!/usr/bin/env python
"""Evaluation CLI.

Same surface as the reference `test.py`: loads a checkpoint, runs the test
split REPLICATION_TIMES times, aggregates mean / 1.96*sigma/sqrt(n) CI / min /
max per metric, prints a table, and writes `metrics_<TIME>.json`
(`test.py:41-156` in the reference). With TEST.COUNT_TIME, per-batch sampling
wall-clock is accumulated and dumped to `times.txt`
(`modeltype/base.py:44-53`, `mld.py:389-406`) — the throughput contract
BASELINE.md records.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--cfg_assets", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--checkpoint", default=None, help="params checkpoint path override")
    p.add_argument("--replication_times", type=int, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this applies jax.config after import)")
    p.add_argument("opts", nargs="*", default=[],
                   help="dotted config overrides, e.g. TEST.MEAN=true")
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from seeme_tpu.config import load_config
    from seeme_tpu.config.build import build_system
    from seeme_tpu.core.masks import lengths_to_mask
    from seeme_tpu.data import get_datamodule
    from seeme_tpu.data.batch import eval_batches
    from seeme_tpu.eval import EgoMetric, get_metric_statistics
    from seeme_tpu.train.checkpoint import restore_params
    from seeme_tpu.utils.logger import create_experiment_dir, create_logger

    from seeme_tpu.config.loader import parse_dotted_overrides

    overrides = parse_dotted_overrides(args.opts)
    if args.batch_size is not None:
        overrides.setdefault("TEST", {})["BATCH_SIZE"] = args.batch_size
    cfg = load_config(args.cfg, args.cfg_assets, overrides=overrides)
    if args.replication_times is not None:
        cfg["TEST"]["REPLICATION_TIMES"] = args.replication_times

    exp_dir = create_experiment_dir(cfg, phase="test")
    logger = create_logger(exp_dir, phase="test")

    datamodule = get_datamodule(cfg)
    is_t2m = cfg.get("DATASET_NAME") in ("humanml3d", "kit")
    is_a2m = cfg.get("DATASET_NAME") in ("humanact12", "uestc")
    if is_t2m:
        from seeme_tpu.config.build import build_t2m_system

        system, sys_cfg = build_t2m_system(
            cfg, datamodule, use_fused=bool(cfg.select("TEST.USE_FUSED", False))
        )
    elif is_a2m:
        from seeme_tpu.config.build import build_a2m_system

        system, sys_cfg = build_a2m_system(
            cfg, datamodule, use_fused=bool(cfg.select("TEST.USE_FUSED", False))
        )
    else:
        # parity evals run the bit-faithful XLA scan by default; the ~0.8%-
        # deviating fused Pallas sampler is an explicit opt-in here (demo.py
        # and bench.py keep it on)
        system, sys_cfg = build_system(
            cfg, datamodule.mean, datamodule.std,
            use_fused=bool(cfg.select("TEST.USE_FUSED", False)),
        )
    params = system.init_params(jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234))))

    ckpt = args.checkpoint or str(cfg.select("TEST.CHECKPOINTS", "") or "")
    if ckpt:
        from seeme_tpu.train.checkpoint import resolve_latest

        ckpt = resolve_latest(ckpt)
    if ckpt and os.path.exists(ckpt):
        params = restore_params(ckpt, params)
        logger.info("loaded checkpoint %s", ckpt)
    else:
        logger.info("no checkpoint found (%r) — evaluating random init", ckpt)

    stage = str(cfg.select("TRAIN.STAGE", "diffusion"))
    batch_size = int(cfg.TEST.BATCH_SIZE)
    reps = int(cfg.select("TEST.REPLICATION_TIMES", 1))
    count_time = bool(cfg.select("TEST.COUNT_TIME", False))

    if is_t2m:
        _t2m_eval(cfg, system, sys_cfg, params, datamodule, logger, exp_dir,
                  stage, batch_size, reps)
        return
    if is_a2m:
        _a2m_eval(cfg, system, sys_cfg, params, datamodule, logger, exp_dir,
                  batch_size, reps)
        return

    # sampling (embeds the fused Pallas kernels) and FK compile separately —
    # one combined graph pushes the axon remote compiler past 10 minutes
    if stage == "vae":
        sample_mean = bool(cfg.select("TEST.MEAN", False))
        fact = cfg.select("TEST.FACT", None)
        fact = float(fact) if fact not in (None, 1, 1.0) else None
        sample_jit = jax.jit(
            lambda p, b, r: system.reconstruct(
                p, b, r, sample_mean=sample_mean, fact=fact
            )
        )
    else:
        # condition encoding (incl. the 20k-pt PointNet, the frozen eval-time
        # bottleneck) is deterministic in (params, batch): compute it once per
        # batch and reuse across replications — only the reverse diffusion
        # consumes the per-replication rng. Numerically identical to
        # re-encoding (same function, same inputs).
        encode_jit = jax.jit(system.encode_conditioning)
        sample_from_cond_jit = jax.jit(
            lambda p, c, r: system.sample_from_cond(p, c, r)
        )
        cond_cache: dict = {}

        def sample_jit(p, b, r, _key=None):
            cond = cond_cache.get(_key)
            if cond is None:
                cond = encode_jit(p, b)
                if _key is not None:
                    cond_cache[_key] = cond
            return sample_from_cond_jit(p, cond, r)

    fk_jit = jax.jit(system.eval_fk)

    def eval_step(p, b, r, _key=None):
        if stage == "vae":
            feats_rst = sample_jit(p, b, r)
        else:
            feats_rst = sample_jit(p, b, r, _key=_key)
        return fk_jit(p, b, feats_rst)

    save_preds = bool(cfg.select("TEST.SAVE_PREDICTIONS", False))
    all_metrics = []
    times = []
    for rep in range(reps):
        metric = EgoMetric(split=str(cfg.select("TEST.SPLIT", "test")))
        rng = jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234)) + rep)
        for batch_idx, (batch_np, n_valid) in enumerate(
            eval_batches(datamodule, "test", batch_size)
        ):
            batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
            rng, step_rng = jax.random.split(rng)
            t0 = time.perf_counter()
            # batches iterate shuffle=False, so batch_idx identifies the same
            # batch in every replication (cond cache key). With COUNT_TIME the
            # cache is bypassed so every timed window includes condition
            # encoding — the reference protocol times the full sampling path
            # each replication (`modeltype/base.py:44-53`)
            out = eval_step(params, batch, step_rng,
                            _key=None if count_time else batch_idx)
            out["feats_rst"].block_until_ready()
            if count_time:
                times.append(time.perf_counter() - t0)
            mask = lengths_to_mask(batch["length"], sys_cfg.motion_length)
            # padded tail rows (trailing partial batch) must not count
            metric.update(
                out["joints_rst"][:n_valid], out["joints_ref"][:n_valid],
                out["quat_rst"][:n_valid], out["quat_ref"][:n_valid],
                mask[:n_valid],
            )
            if save_preds and rep == 0:
                # the save_npy contract (`modeltype/base.py:215-256`): one npy
                # per sequence, predictions and ground truth side by side
                pred_dir = os.path.join(exp_dir, "predictions")
                os.makedirs(pred_dir, exist_ok=True)
                j_rst = np.asarray(out["joints_rst"])
                j_ref = np.asarray(out["joints_ref"])
                for b in range(n_valid):
                    i = batch_idx * batch_size + b
                    L = int(batch_np["length"][b])
                    np.save(os.path.join(pred_dir, f"pred_{i}.npy"), j_rst[b, :L])
                    np.save(os.path.join(pred_dir, f"gt_{i}.npy"), j_ref[b, :L])
        results = metric.compute(sync=jax.process_count() > 1)
        all_metrics.append(results)
        logger.info("replication %d: %s", rep,
                    " ".join(f"{k}={v:.3f}" for k, v in sorted(results.items())))

    stats = get_metric_statistics(all_metrics)
    for k, s in sorted(stats.items()):
        logger.info(
            "%s: %.4f ± %.4f [%.4f, %.4f]", k, s["mean"], s["conf_interval"], s["min"], s["max"]
        )

    stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
    out_path = os.path.join(exp_dir, f"metrics_{stamp}.json")
    with open(out_path, "w") as f:
        json.dump(stats, f, indent=2)
    logger.info("wrote %s", out_path)

    if count_time and times:
        with open(os.path.join(exp_dir, "times.txt"), "w") as f:
            f.writelines(f"{t}\n" for t in times)
        per_sample = float(np.mean(times[1:]) / batch_size) if len(times) > 1 else float(times[0]) / batch_size
        logger.info("mean time per sample (batch %d): %.6fs (%.1f samples/s)",
                    batch_size, per_sample, 1.0 / per_sample)


def _t2m_eval(cfg, system, sys_cfg, params, datamodule, logger, exp_dir,
              stage, batch_size, reps):
    """Text-to-motion evaluation (`t2m_eval`, `mld.py:1907-1996`): sample (or
    reconstruct for stage 'vae'), recover joints via RIC, report MR metrics
    (MPJPE/PA-MPJPE/ACCEL) and — when evaluator embeddings are available —
    TM2T metrics."""
    import json
    import time

    import jax
    import numpy as np

    from seeme_tpu.data.batch import eval_batches
    from seeme_tpu.eval import MRMetrics, TM2TMetrics, get_metric_statistics
    from seeme_tpu.eval.t2m_evaluator import T2MEvaluator

    sample_fn = jax.jit(
        lambda p, t, r: system.sample(p, t, r)
    )
    # hidden-state text modes carry a token-validity mask so fixed-length
    # padding is excluded from attention (ADVICE r2)
    sample_fn_masked = jax.jit(
        lambda p, t, m, r: system.sample(p, t, r, cond_mask=m)
    )
    recon_fn = jax.jit(lambda p, b, r: system.reconstruct(p, b, r))

    # TM2T evaluator embeddings (`t2m_eval`, `mld.py:1955-1995`); pretrained
    # weights via TEST.T2M_EVALUATOR_DIR (converted text/ move/ motion/
    # subdirs), random-init otherwise — numbers only comparable when loaded
    evaluator = T2MEvaluator(
        nfeats=sys_cfg.nfeats,
        ckpt_dir=str(cfg.select("TEST.T2M_EVALUATOR_DIR", "") or "") or None,
        glove_root=str(cfg.select("DATASET.WORD_VERTILIZER_PATH", "") or "") or None,
    )
    if not evaluator.is_pretrained:
        logger.info("t2m evaluator running with random init "
                    "(set TEST.T2M_EVALUATOR_DIR for comparable TM2T numbers)")
    renorm4t2m = getattr(datamodule, "renorm4t2m", None)

    count_time = bool(cfg.select("TEST.COUNT_TIME", False))
    times = []
    all_metrics = []
    for rep in range(reps):
        mr = MRMetrics()
        tm2t = TM2TMetrics()
        rng = jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234)) + rep)
        for batch_np, n_valid in eval_batches(datamodule, "test", batch_size):
            texts = batch_np.pop("text", None)
            if "text_emb" not in batch_np and texts is not None:
                batch_np["text_emb"] = system.text_encoder(texts)
                tm = system.text_encoder.token_mask(texts)
                if tm is not None:
                    batch_np["text_mask"] = tm
            batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
            rng, step_rng = jax.random.split(rng)
            t0 = time.time()
            if stage == "vae":
                feats_rst = recon_fn(params, batch, step_rng)
            elif "text_mask" in batch:
                feats_rst = sample_fn_masked(
                    params, batch["text_emb"], batch["text_mask"], step_rng)
            else:
                feats_rst = sample_fn(params, batch["text_emb"], step_rng)
            if count_time:
                feats_rst.block_until_ready()
                times.append(time.time() - t0)
            joints_rst = np.asarray(datamodule.feats2joints(feats_rst))
            joints_ref = np.asarray(datamodule.feats2joints(batch["motion"]))
            lengths = np.asarray(batch["length"])
            # padded tail rows (trailing partial batch) must not count
            mr.update(joints_rst[:n_valid], joints_ref[:n_valid],
                      lengths[:n_valid])
            if texts is not None and renorm4t2m is not None:
                rec = renorm4t2m(np.asarray(feats_rst))
                gt = renorm4t2m(np.asarray(batch["motion"]))
                tm2t.update(
                    evaluator.embed_text(texts)[:n_valid],
                    evaluator.embed_motion(rec, lengths)[:n_valid],
                    evaluator.embed_motion(gt, lengths)[:n_valid],
                )
        results = mr.compute()
        if tm2t.text_embeddings:
            results.update(tm2t.compute())
        all_metrics.append(results)
        logger.info("replication %d: %s", rep,
                    " ".join(f"{k}={v:.3f}" for k, v in sorted(results.items())))

    # multimodality: re-sample MM_NUM_REPEATS times per caption on a subset
    # and report within-sample diversity (`test.py:124-129` mm_mode +
    # `metrics/mm.py`)
    if bool(cfg.select("TEST.MM", False)):
        from seeme_tpu.eval import MMMetrics

        mm_samples = int(cfg.select("TEST.MM_NUM_SAMPLES", 32))
        mm_repeats = int(cfg.select("TEST.MM_NUM_REPEATS", 8))
        mm = MMMetrics(mm_num_times=int(cfg.select("TEST.MM_NUM_TIMES", 10)))
        rng = jax.random.PRNGKey(7)
        batch_np, mm_valid = next(
            eval_batches(datamodule, "test", min(mm_samples, batch_size)))
        texts = batch_np.pop("text", None)
        if "text_emb" not in batch_np and texts is not None:
            batch_np["text_emb"] = system.text_encoder(texts)
            tm = system.text_encoder.token_mask(texts)
            if tm is not None:
                batch_np["text_mask"] = tm
        text_emb = jax.numpy.asarray(batch_np["text_emb"])
        text_mask = (jax.numpy.asarray(batch_np["text_mask"])
                     if "text_mask" in batch_np else None)
        reps = []
        for r in range(mm_repeats):
            rng, sr = jax.random.split(rng)
            # same masked conditioning as the main metrics loop
            if text_mask is not None:
                feats = sample_fn_masked(params, text_emb, text_mask, sr)
            else:
                feats = sample_fn(params, text_emb, sr)
            reps.append(np.asarray(feats).reshape(len(text_emb), -1)[:mm_valid])
        mm.update(np.stack(reps, axis=1))
        mm_val = mm.compute()
        all_metrics = [dict(m, **mm_val) for m in all_metrics]
        logger.info("MultiModality: %.4f", mm_val["MultiModality"])

    if count_time and times:
        # the reference timing contract (`modeltype/base.py:44-53`,
        # `mld.py:389-406`): per-batch sampling wall clock to times.txt
        with open(f"{exp_dir}/times.txt", "w") as f:
            f.writelines(f"{t}\n" for t in times)
        per_sample = (float(np.mean(times[1:]) / batch_size)
                      if len(times) > 1 else float(times[0]) / batch_size)
        logger.info("mean time per sample (batch %d): %.6fs (%.1f samples/s)",
                    batch_size, per_sample, 1.0 / per_sample)

    stats = get_metric_statistics(all_metrics)
    for k, s in sorted(stats.items()):
        logger.info("%s: %.4f ± %.4f [%.4f, %.4f]",
                    k, s["mean"], s["conf_interval"], s["min"], s["max"])
    stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
    out_path = f"{exp_dir}/metrics_{stamp}.json"
    with open(out_path, "w") as f:
        json.dump(stats, f, indent=2)
    logger.info("wrote %s", out_path)


def _a2m_eval(cfg, system, sys_cfg, params, datamodule, logger, exp_dir,
              batch_size, reps):
    """Action-to-motion evaluation: sample conditioned on the test labels,
    FK to joints, embed/classify with the pretrained GRU recognition model,
    report FID / accuracy / Diversity / MultiModality (the reference's
    `metrics/gru.py` / `metrics/stgcn.py` protocol). Without a converted
    evaluator checkpoint (TEST.EVALUATOR_CHECKPOINT, produced by
    `tools/convert_checkpoint.py --kind a2m_gru`) a randomly-initialized
    evaluator still exercises the full protocol on synthetic data."""
    import json
    import os
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from seeme_tpu.config.build import load_smpl_or_synthetic
    from seeme_tpu.data.batch import eval_batches
    from seeme_tpu.eval import ActionMetrics, MotionDiscriminator, get_metric_statistics
    from seeme_tpu.train.checkpoint import restore_params

    smpl = load_smpl_or_synthetic(cfg)
    T, J = sys_cfg.num_frames, 24
    # uestc ships the rot6d ST-GCN evaluator, humanact12 the joints GRU
    # (`metrics/stgcn.py:32-46` vs `metrics/gru.py`)
    use_stgcn = str(cfg.get("DATASET_NAME")) == "uestc"
    if use_stgcn:
        from seeme_tpu.eval import STGCN

        clf = STGCN(num_class=sys_cfg.num_classes)
        clf_in = jnp.zeros((1, T, J, 6))
    else:
        clf = MotionDiscriminator(
            hidden_size=int(cfg.select("TEST.EVALUATOR_HIDDEN", 128)),
            num_layers=int(cfg.select("TEST.EVALUATOR_LAYERS", 2)),
            output_size=sys_cfg.num_classes,
        )
        clf_in = jnp.zeros((1, T, J * 3))
    clf_params = clf.init(
        jax.random.PRNGKey(0), clf_in, jnp.ones((1,), jnp.int32)
    )
    eval_ckpt = str(cfg.select("TEST.EVALUATOR_CHECKPOINT", "") or "")
    if eval_ckpt and os.path.exists(eval_ckpt):
        clf_params = restore_params(eval_ckpt, clf_params)
        logger.info("loaded evaluator %s", eval_ckpt)
    else:
        logger.info("no evaluator checkpoint — random-init recognition model")

    sample_fn = jax.jit(lambda p, a, r: system.sample(p, a, r))
    if use_stgcn:
        # the evaluator consumes the rot6d pose block directly
        fk = jax.jit(lambda f: f[..., : J * 6].reshape(-1, T, J, 6))
    else:
        fk = jax.jit(
            lambda f: system.feats_to_joints(smpl, f).reshape(-1, T, J * 3)
        )
    classify = jax.jit(lambda j, L: clf.apply(clf_params, j, L))

    all_metrics = []
    for rep in range(reps):
        metric = ActionMetrics(num_classes=sys_cfg.num_classes)
        rng = jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234)) + rep)
        for batch_np, n_valid in eval_batches(datamodule, "test", batch_size):
            labels = jnp.asarray(batch_np["action"])
            lengths = jnp.asarray(batch_np["length"])
            rng, sr = jax.random.split(rng)
            feats_gen = sample_fn(params, labels, sr)
            logits_gen, feats_g = classify(fk(feats_gen), lengths)
            _, feats_r = classify(fk(jnp.asarray(batch_np["motion"])), lengths)
            # padded tail rows (trailing partial batch) must not count
            metric.update(feats_g[:n_valid], feats_r[:n_valid],
                          logits_gen[:n_valid],
                          batch_np["action"][:n_valid])
        results = metric.compute()
        all_metrics.append(results)
        logger.info("replication %d: %s", rep,
                    " ".join(f"{k}={v:.3f}" for k, v in sorted(results.items())))

    stats = get_metric_statistics(all_metrics)
    for k, s in sorted(stats.items()):
        logger.info("%s: %.4f ± %.4f [%.4f, %.4f]",
                    k, s["mean"], s["conf_interval"], s["min"], s["max"])
    stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
    out_path = f"{exp_dir}/metrics_{stamp}.json"
    with open(out_path, "w") as f:
        json.dump(stats, f, indent=2)
    logger.info("wrote %s", out_path)


if __name__ == "__main__":
    main()
