#!/usr/bin/env python
"""Break down the stage-1/stage-2 train steps on the real chip.

Companion to window_profile.py (which profiles the sampling window): times
each train-step segment amortized — K dependent iterations inside one jitted
program, scalar-synced, one relay round trip subtracted — so the 58.7 ms
stage-2 step (BASELINE.md) stops being a black box (VERDICT r2 weak #5).

Segments (stage 2 / diffusion): scene-PointNet conditioning encode,
interactee+wearer VAE encodes, denoiser forward, loss forward, loss
forward+backward (with the STAGE_TRAINABLE stop_gradient freeze, exactly as
make_train_step computes it), optimizer update, and the full fused step.
Stage 1 (vae): loss forward (VAE enc/dec + SMPL joint losses), backward,
optimizer, full step.

Run: python scripts/train_profile.py [--stage diffusion|vae|both]
Writes scripts/TRAIN_PROFILE.json next to TPU_SMOKE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 64
K = 10
RELAY_S = 0.032


def timed(fn, *args):
    import jax

    f = jax.jit(fn)
    for _ in range(2):
        float(f(*args))
    best = min(
        (lambda t0: (float(f(*args)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(5)
    )
    return (best - RELAY_S) / K * 1000.0  # ms per iteration


def _amortize(body_fn):
    """K dependent repeats of body_fn(acc) -> scalar, CSE-proofed."""
    import jax
    import jax.numpy as jnp

    def run(*args):
        def body(i, acc):
            return acc + body_fn(acc, *args)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    return run


def profile_stage(stage: str):
    import jax
    import jax.numpy as jnp
    import optax

    from seeme_tpu.core import synthetic_smpl
    from seeme_tpu.data import SyntheticEgoDataset
    from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem
    from seeme_tpu.train import create_train_state, make_optimizer, make_train_step
    from seeme_tpu.train.state import STAGE_TRAINABLE

    cfg = SeeMeConfig()
    data = SyntheticEgoDataset(num_samples=BATCH, motion_length=cfg.motion_length,
                               scene_points=cfg.scene_points, seed=0)
    system = SeeMeSystem(cfg, synthetic_smpl(n_verts=6890), data.mean, data.std)
    params = system.init_params(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in next(data.batches(BATCH, shuffle=False)).items()}
    rng = jax.random.PRNGKey(1)
    loss_fn = system.vae_loss if stage == "vae" else system.diffusion_loss
    trainable = set(STAGE_TRAINABLE[stage])

    def frozen_compute(params, batch, r):
        p = {k: (v if k in trainable else jax.lax.stop_gradient(v))
             for k, v in params.items()}
        loss, _ = loss_fn(p, batch, r)
        return loss

    def perturb(batch, acc):
        # perturb feats AND scene: a loop-invariant scene would let XLA hoist
        # the PointNet out of the amortization loop and undercount it
        b = dict(batch)
        b["feats"] = b["feats"] + acc * 1e-12
        if "scene" in b:
            b["scene"] = b["scene"] + acc * 1e-12
        if "scene_feats" in b:
            b["scene_feats"] = b["scene_feats"] + acc * 1e-12
        return b

    out = {}

    # ---- loss forward / forward+backward
    out["loss_fwd_ms"] = round(timed(_amortize(
        lambda acc, p, b, r: frozen_compute(p, perturb(b, acc), r)),
        params, batch, rng), 3)

    def fwd_bwd(acc, p, b, r):
        loss, grads = jax.value_and_grad(frozen_compute)(p, perturb(b, acc), r)
        return loss + sum(jnp.sum(jnp.abs(g))
                          for g in jax.tree.leaves(grads["denoiser" if stage != "vae" else "vae"]))

    out["loss_fwd_bwd_ms"] = round(
        timed(_amortize(fwd_bwd), params, batch, rng), 3)

    # ---- optimizer alone (precomputed grads, update+apply amortized)
    opt = make_optimizer(stage, params)
    opt_state = opt.init(params)
    _, grads0 = jax.jit(jax.value_and_grad(frozen_compute))(params, batch, rng)

    def opt_step(acc, grads, opt_state, p):
        g = jax.tree.map(lambda x: x + acc * 1e-12, grads)
        updates, _ = opt.update(g, opt_state, p)
        newp = optax.apply_updates(p, updates)
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(
            newp["denoiser" if stage != "vae" else "vae"])) * 1e-12

    out["optimizer_ms"] = round(
        timed(_amortize(opt_step), grads0, opt_state, params), 3)

    # ---- full train step (loss+grad+update+apply), same amortization
    def full_step(acc, p, o, b, r):
        loss, grads = jax.value_and_grad(frozen_compute)(p, perturb(b, acc), r)
        updates, _ = opt.update(grads, o, p)
        newp = optax.apply_updates(p, updates)
        key = "denoiser" if stage != "vae" else "vae"
        return loss + sum(jnp.sum(jnp.abs(l))
                          for l in jax.tree.leaves(newp[key])) * 1e-12

    out["full_step_ms"] = round(
        timed(_amortize(full_step), params, opt_state, batch, rng), 3)

    if stage != "vae" and system.use_scene:
        # cached-scene step (train.py's stage-2 precompute): the frozen
        # PointNet features ride in the batch, only the trainable projection
        # runs per step
        cached = dict(batch)
        cached["scene_feats"] = system.scene_features(params, batch["scene"])
        del cached["scene"]
        out["full_step_cached_ms"] = round(
            timed(_amortize(full_step), params, opt_state, cached, rng), 3)

    if stage != "vae":
        # ---- conditioning encode (scene PointNet + interactee VAE encode)
        out["cond_tokens_ms"] = round(timed(_amortize(
            lambda acc, p, b, r: system._condition_tokens(
                p, perturb(b, acc), r, train=True).sum()),
            params, batch, rng), 3)
        if system.use_scene:
            out["scene_encode_ms"] = round(timed(_amortize(
                lambda acc, p, b: system.encode_scene(
                    p, b["scene"] + acc * 1e-12).sum()),
                params, batch), 3)

        # ---- wearer VAE encode
        actor_feats = system.actor_features(batch, 0)
        out["vae_encode_ms"] = round(timed(_amortize(
            lambda acc, p, f: system.encode_motion_latent(
                p["vae"], f + acc * 1e-12)[0].sum()),
            params, actor_feats), 3)

        # ---- denoiser forward / forward+backward alone
        z = jnp.zeros((BATCH, cfg.latent_dim[0], cfg.latent_dim[-1]))
        cond = jnp.zeros((BATCH, system.n_cond_tokens, cfg.latent_dim[-1]))
        ts = jnp.zeros((BATCH,), jnp.int32)

        out["denoiser_fwd_ms"] = round(timed(_amortize(
            lambda acc, p, zz, cc: system.denoiser.apply(
                p["denoiser"], zz + acc * 1e-12, ts, cc).sum()),
            params, z, cond), 3)

        def den_bwd(acc, p, zz, cc):
            def f(dp):
                return system.denoiser.apply(dp, zz + acc * 1e-12, ts, cc).sum()

            loss, grads = jax.value_and_grad(f)(p["denoiser"])
            return loss + sum(jnp.sum(jnp.abs(g))
                              for g in jax.tree.leaves(grads)) * 1e-12

        out["denoiser_fwd_bwd_ms"] = round(
            timed(_amortize(den_bwd), params, z, cond), 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="both",
                    choices=["vae", "diffusion", "both"])
    args = ap.parse_args()

    result = {"batch": BATCH, "amortized_iters": K,
              "relay_adjustment_s": RELAY_S}
    stages = ["diffusion", "vae"] if args.stage == "both" else [args.stage]
    for s in stages:
        result[s] = profile_stage(s)
        print(f"{s}: {json.dumps(result[s])}")

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "TRAIN_PROFILE.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
