#!/usr/bin/env python
"""Train an action-recognition evaluator natively.

The reference evaluates action-to-motion with PRETRAINED recognition models
(HumanAct12: the action2motion GRU, `mld/models/architectures/
humanact12_gru.py:6-82`; UESTC: the ST-GCN, `uestc_stgcn.py:13-111`) whose
training code lives outside the repo — it only ships the `.tar` weights.
On this zero-egress box those weights are absent, so `test.py` falls back to
a randomly-initialized evaluator (honestly logged, but FID/accuracy are then
meaningless). This CLI trains the same architectures natively on the
datamodule's train split — the real release when present under `datasets/`,
the synthetic stand-in otherwise — so TEST.EVALUATOR_CHECKPOINT yields
meaningful recognition metrics either way.

For text-to-motion configs (humanml3d/kit) the same CLI trains the TM2T
evaluator trio (TextEncoderBiGRUCo / MovementConvEncoder /
MotionEncoderBiGRUCo, `t2m_textenc.py:6-48` / `t2m_motionenc.py:6-62`) with
the T2M text-motion-matching contrastive objective (positive pairs pulled,
batch-rolled negatives hinged at margin 10), writing the `text/ move/
motion/` checkpoint layout TEST.T2M_EVALUATOR_DIR consumes.

Usage:
  python tools/train_evaluator.py --cfg configs/config_mld_humanact12.yaml \
      --epochs 50 --out experiments/evaluators/humanact12_gru
  python test.py --cfg configs/config_mld_humanact12.yaml \
      TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/humanact12_gru
  python tools/train_evaluator.py --cfg configs/config_mld_humanml3d.yaml \
      --epochs 50 --out experiments/evaluators/t2m
  python test.py --cfg configs/config_mld_humanml3d.yaml \
      TEST.T2M_EVALUATOR_DIR=experiments/evaluators/t2m
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as `python tools/train_evaluator.py` (repo root on sys.path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--cfg_assets", default=None)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--out", required=True, help="params checkpoint output dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug", action="store_true",
                   help="small synthetic split (cfg DEBUG=true) for smoke runs")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this applies jax.config after import)")
    return p.parse_args()


def train_t2m(args, cfg, logger):
    """Contrastive text-motion-matching training for the TM2T evaluator trio
    (the role of T2M's `train_tex_mot_match`, which the reference consumes
    only as released weights): positive caption/motion pairs are pulled
    together, batch-rolled negatives pushed past margin 10, both
    directions."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from seeme_tpu.data import get_datamodule
    from seeme_tpu.eval.t2m_evaluator import T2MEvaluator
    from seeme_tpu.train.checkpoint import save_params

    datamodule = get_datamodule(cfg)
    nfeats = int(getattr(datamodule, "nfeats", 263))
    ev = T2MEvaluator(
        nfeats=nfeats,
        glove_root=str(cfg.select("DATASET.WORD_VERTILIZER_PATH", "") or "")
        or None,
    )
    params = {
        "text": ev.text_params,
        "move": ev.move_params,
        "motion": ev.motion_params,
    }
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    renorm4t2m = getattr(datamodule, "renorm4t2m", lambda f: f)
    margin = 10.0

    def texts_to_arrays(texts):
        words, pos, lens = [], [], []
        for t in texts:
            w, p, n = ev.vectorizer.tokens_to_arrays(t.split(), ev.max_text_len)
            words.append(w)
            pos.append(p)
            lens.append(n)
        return (np.stack(words), np.stack(pos), np.asarray(lens))

    def embed(p, words, pos, cap_lens, feats, lengths):
        emb_t = ev.text_enc.apply(p["text"], words, pos, cap_lens)
        mov = ev.move_enc.apply(p["move"], feats[..., :-4])
        emb_m = ev.motion_enc.apply(p["motion"], mov, lengths // ev.unit_len)
        return emb_t, emb_m

    def loss_fn(p, words, pos, cap_lens, feats, lengths):
        emb_t, emb_m = embed(p, words, pos, cap_lens, feats, lengths)

        def dist(a, b):
            return jnp.sqrt(jnp.sum((a - b) ** 2, -1) + 1e-8)

        pos_d = dist(emb_t, emb_m)
        neg_tm = dist(emb_t, jnp.roll(emb_m, 1, axis=0))
        neg_mt = dist(emb_m, jnp.roll(emb_t, 1, axis=0))
        hinge = (jax.nn.relu(margin - neg_tm) ** 2
                 + jax.nn.relu(margin - neg_mt) ** 2)
        return jnp.mean(pos_d**2) + 0.5 * jnp.mean(hinge)

    @jax.jit
    def train_step(p, s, words, pos, cap_lens, feats, lengths):
        loss, grads = jax.value_and_grad(loss_fn)(
            p, words, pos, cap_lens, feats, lengths)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def embed_jit(p, words, pos, cap_lens, feats, lengths):
        return embed(p, words, pos, cap_lens, feats, lengths)

    def r_precision(split):
        """Top-1 retrieval accuracy in 32-candidate pools (the TM2T
        R-precision protocol, `metrics/tm2t.py`)."""
        hit = tot = 0
        for b in datamodule.batches(split, 32, shuffle=False):
            texts = b.get("text")
            if texts is None or len(texts) < 32:
                continue
            words, pos, lens = texts_to_arrays(texts)
            feats = renorm4t2m(np.asarray(b["motion"], np.float32))
            emb_t, emb_m = embed_jit(
                params, jnp.asarray(words), jnp.asarray(pos),
                jnp.asarray(lens), jnp.asarray(feats),
                jnp.asarray(b["length"]))
            d = np.linalg.norm(
                np.asarray(emb_t)[:, None] - np.asarray(emb_m)[None], axis=-1)
            hit += int((np.argmin(d, axis=1) == np.arange(len(d))).sum())
            tot += len(d)
        return hit / max(tot, 1)

    for epoch in range(args.epochs):
        losses = []
        for b in datamodule.batches("train", args.batch_size,
                                    seed=args.seed + epoch):
            texts = b.get("text")
            if texts is None:
                continue
            words, pos, lens = texts_to_arrays(texts)
            feats = renorm4t2m(np.asarray(b["motion"], np.float32))
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(words), jnp.asarray(pos),
                jnp.asarray(lens), jnp.asarray(feats),
                jnp.asarray(b["length"]))
            losses.append(float(loss))
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            logger.info("epoch %d/%d contrastive=%.4f val R@1(32)=%.3f",
                        epoch, args.epochs, float(np.mean(losses)),
                        r_precision("val"))

    acc = r_precision("test")
    for sub in ("text", "move", "motion"):
        save_params(os.path.join(args.out, sub), params[sub])
    logger.info("saved t2m evaluator trio to %s (test R@1(32)=%.3f)",
                args.out, acc)


def main():
    args = parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import logging

    import jax.numpy as jnp
    import numpy as np
    import optax

    from seeme_tpu.config import load_config
    from seeme_tpu.config.build import build_a2m_system, load_smpl_or_synthetic
    from seeme_tpu.data import get_datamodule
    from seeme_tpu.data.batch import eval_batches
    from seeme_tpu.eval import MotionDiscriminator
    from seeme_tpu.train.checkpoint import save_params

    logger = logging.getLogger("train_evaluator")
    logger.setLevel(logging.INFO)  # jax/absl imports pin root at WARNING
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(h)
        logger.propagate = False

    debug_overrides = {
        # small split + short sequences: smoke-test scale for the CPU tier
        "DEBUG": True,
        "DATASET": {"SAMPLER": {"MAX_LEN": 64, "MIN_LEN": 16}},
    }
    cfg = load_config(args.cfg, args.cfg_assets,
                      overrides=debug_overrides if args.debug else None)
    name = str(cfg.get("DATASET_NAME"))
    if name in ("humanml3d", "kit"):
        return train_t2m(args, cfg, logger)
    if name not in ("humanact12", "uestc"):
        raise SystemExit(f"evaluator training covers a2m/t2m datasets, got {name}")

    datamodule = get_datamodule(cfg)
    system, sys_cfg = build_a2m_system(cfg, datamodule)
    smpl = load_smpl_or_synthetic(cfg)
    T, J = sys_cfg.num_frames, 24

    use_stgcn = name == "uestc"
    if use_stgcn:
        from seeme_tpu.eval import STGCN

        clf = STGCN(num_class=sys_cfg.num_classes)
        clf_in = jnp.zeros((1, T, J, 6))

        def to_input(motion):  # the evaluator consumes the rot6d pose block
            return motion[..., : J * 6].reshape(-1, T, J, 6)
    else:
        clf = MotionDiscriminator(
            hidden_size=int(cfg.select("TEST.EVALUATOR_HIDDEN", 128)),
            num_layers=int(cfg.select("TEST.EVALUATOR_LAYERS", 2)),
            output_size=sys_cfg.num_classes,
        )
        clf_in = jnp.zeros((1, T, J * 3))

        def to_input(motion):  # FK to joint positions, as `metrics/gru.py`
            return system.feats_to_joints(smpl, motion).reshape(-1, T, J * 3)

    params = clf.init(jax.random.PRNGKey(args.seed), clf_in,
                      jnp.ones((1,), jnp.int32))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p, motion, lengths, labels):
        logits, _ = clf.apply(p, to_input(motion), lengths)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    @jax.jit
    def train_step(p, s, motion, lengths, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, motion, lengths, labels)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def accuracy_batch(p, motion, lengths, labels):
        logits, _ = clf.apply(p, to_input(motion), lengths)
        return jnp.argmax(logits, -1) == labels

    def split_accuracy(split):
        hit = tot = 0
        for b, nv in eval_batches(datamodule, split, args.batch_size):
            match = np.asarray(accuracy_batch(
                params, jnp.asarray(b["motion"]), jnp.asarray(b["length"]),
                jnp.asarray(b["action"])))
            hit += int(match[:nv].sum())
            tot += nv
        return hit / max(tot, 1)

    val_split = "val" if name == "humanact12" else "test"
    for epoch in range(args.epochs):
        losses = []
        for b in datamodule.batches("train", args.batch_size,
                                    seed=args.seed + epoch):
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(b["motion"]),
                jnp.asarray(b["length"]), jnp.asarray(b["action"]))
            losses.append(float(loss))
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            logger.info("epoch %d/%d ce=%.4f val_acc=%.3f", epoch,
                        args.epochs, float(np.mean(losses)),
                        split_accuracy(val_split))

    acc = split_accuracy(val_split)
    save_params(args.out, params)
    logger.info("saved evaluator to %s (final %s accuracy %.3f)",
                args.out, val_split, acc)


if __name__ == "__main__":
    main()
