"""Measure the 77-token (clip_hidden/bert) sampling window — the XLA scan,
which is the framework's (only) token-mode route.

History: a sample-grid Pallas kernel for the token modes (built round 4,
multi-sample packing added round 5) measured 0.72x the scan at k=1 and
monotonically worse with packing (2026-08-19 capture, B=32/guidance 7.5:
scan 18.7 vs fused 25.9/29.3/32.6 ms/window at k=1/4/8 — the packed
attention is a dense masked (n_cfg*k*S)^2 block, so attention flops grow
~k-fold, and the 79-token per-step compute already amortizes the scan's
dispatch overhead). The kernel was deleted with that measurement as the
decision record (BASELINE.md "Long-conditioning"); this script keeps the
scan serving number reproducible.

Usage (needs the TPU relay; CPU-only sanity with --cpu):
    python scripts/token_bench.py [--batch 32] [--n_cond 77] [--out PATH]

Writes scripts/TOKEN_BENCH.json and prints the table. Timing follows the
repo's relay protocol: scalar-sync, best-of-k timed calls, windows amortized
per jitted call (BASELINE.md environment caveats).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n_cond", type=int, default=77)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=7.5)
    ap.add_argument("--windows", type=int, default=5,
                    help="dependent windows amortized per jitted call")
    ap.add_argument("--timed", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "TOKEN_BENCH.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from seeme_tpu.diffusion import DiffusionSchedule
    from seeme_tpu.models import Denoiser

    B, N, NS, G = args.batch, args.n_cond, args.steps, args.guidance
    D = 256
    den = Denoiser(nfeats=75, md_trans=False, text_encoded_dim=768)
    rng = np.random.RandomState(0)
    z0 = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    cond = jnp.asarray(rng.randn(B, N, 768).astype(np.float32))
    lengths = rng.randint(5, N + 1, size=B)
    mask = jnp.asarray(np.arange(N)[None, :] < lengths[:, None])
    cond = cond * mask[..., None]
    params = den.init(jax.random.PRNGKey(0), z0, jnp.zeros((B,), jnp.int32),
                      cond)
    cond2 = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    sched = DiffusionSchedule()

    def scan_window(z_seed):
        # ddim_sample's body verbatim (`diffusion/sampling.py:24-64`) but
        # seeded from the carry so back-to-back windows stay dependent
        # (nothing for XLA to hoist out of the amortization loop)
        timesteps = jnp.asarray(sched.ddim_timesteps(NS))

        def body(z, t):
            z_in = jnp.concatenate([z, z], axis=0) if G > 1.0 else z
            pred = den.apply(params, z_in,
                             jnp.full((z_in.shape[0],), t, jnp.int32),
                             cond2 if G > 1.0 else cond,
                             cond_mask=mask2 if G > 1.0 else mask)
            if G > 1.0:
                uncond, cond_pred = jnp.split(pred, 2, axis=0)
                pred = uncond + G * (cond_pred - uncond)
            return sched.ddim_step(pred, t, z, NS), None

        z, _ = jax.lax.scan(body, z_seed, timesteps)
        return z

    @jax.jit
    def run(z):
        def body(z, _):
            # window output seeds the next window: dependent chaining so
            # the ~32 ms relay round trip amortizes across windows
            return scan_window(z), None

        z, _ = jax.lax.scan(body, z, None, length=args.windows)
        return z

    results = {"batch": B, "n_cond": N, "steps": NS, "guidance": G,
               "windows_per_call": args.windows,
               "backend": jax.default_backend()}

    out = run(z0)
    float(jnp.sum(out))  # compile + sync on a scalar (relay protocol)
    times = []
    for _ in range(args.timed):
        t0 = time.perf_counter()
        float(jnp.sum(run(z0)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    per_window_ms = best / args.windows * 1e3
    results["scan"] = {
        "best_call_s": best,
        "per_window_ms": per_window_ms,
        "seqs_per_s": B / (best / args.windows),
    }
    print(f"scan: {per_window_ms:.2f} ms/window "
          f"({results['scan']['seqs_per_s']:.0f} seqs/s) "
          f"best-of-{args.timed}, {args.windows} windows/call")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
