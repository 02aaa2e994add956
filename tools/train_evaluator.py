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

Usage:
  python tools/train_evaluator.py --cfg configs/config_mld_humanact12.yaml \
      --epochs 50 --out experiments/evaluators/humanact12_gru
  python test.py --cfg configs/config_mld_humanact12.yaml \
      TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/humanact12_gru
"""

from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--cfg_assets", default=None)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--out", required=True, help="params checkpoint output dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this applies jax.config after import)")
    return p.parse_args()


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
    from seeme_tpu.eval import MotionDiscriminator
    from seeme_tpu.train.checkpoint import save_params

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    logger = logging.getLogger("train_evaluator")

    cfg = load_config(args.cfg, args.cfg_assets)
    name = str(cfg.get("DATASET_NAME"))
    if name not in ("humanact12", "uestc"):
        raise SystemExit(f"evaluator training covers the a2m datasets, got {name}")

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
        return jnp.sum(jnp.argmax(logits, -1) == labels)

    def split_accuracy(split):
        hit = tot = 0
        for b in datamodule.batches(split, args.batch_size, shuffle=False):
            hit += int(accuracy_batch(
                params, jnp.asarray(b["motion"]), jnp.asarray(b["length"]),
                jnp.asarray(b["action"])))
            tot += len(b["action"])
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
