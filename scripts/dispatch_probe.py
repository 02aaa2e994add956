#!/usr/bin/env python
"""Dispatch-granularity probe: host-RSS growth per dispatch + k-step scan wins.

Two questions about the axon relay this box talks to the TPU through
(BASELINE.md "Known issue"):

1. Does host RSS grow per *dispatch* even for a trivial jitted program?
   (If yes, the growth is relay-client bookkeeping, not framework code.)
2. How much does k-step scan dispatch (`make_scan_train_step`) recover of
   the ~32 ms relay round trip the 1 ms cached stage-2 step otherwise pays
   per step, and does it cut the RSS growth per *step* by k?

Run: python scripts/dispatch_probe.py [--trivial-only]
Writes scripts/DISPATCH_PROBE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 64


def rss_mb() -> float:
    import psutil

    return psutil.Process().memory_info().rss / 1e6


def trivial_phase(n: int = 400):
    """n dispatches of a trivial jitted program, scalar-synced like the
    train loop's per-step metric fetch."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 1.0001 + 1.0)
    x = jnp.ones((8,), jnp.float32)
    for _ in range(3):
        x = f(x)
        float(x.sum())
    r0, t0 = rss_mb(), time.perf_counter()
    for _ in range(n):
        x = f(x)
        float(x.sum())
    dt, dr = time.perf_counter() - t0, rss_mb() - r0
    return {
        "dispatches": n,
        "wall_ms_per_dispatch": dt / n * 1000.0,
        "rss_growth_mb_per_dispatch": dr / n,
        "rss_growth_mb_total": dr,
    }


def train_phases(ks=(1, 8, 32), steps_target=1600):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seeme_tpu.core import synthetic_smpl
    from seeme_tpu.data import SyntheticEgoDataset
    from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem
    from seeme_tpu.train import (
        create_train_state,
        make_optimizer,
        make_scan_train_step,
        make_train_step,
    )

    cfg = SeeMeConfig()
    data = SyntheticEgoDataset(num_samples=BATCH, motion_length=cfg.motion_length,
                               scene_points=cfg.scene_points, seed=0)
    system = SeeMeSystem(cfg, synthetic_smpl(n_verts=6890), data.mean, data.std)
    params = system.init_params(jax.random.PRNGKey(0))
    batch_np = next(data.batches(BATCH, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    # frozen-scene cache exactly as train.py attaches it
    batch["scene_feats"] = system.scene_features(params, batch["scene"])
    del batch["scene"]
    opt = make_optimizer("diffusion", params)

    out = {}
    for k in ks:
        label = k if isinstance(k, str) else f"k{k}"
        state = create_train_state(params, opt, jax.random.PRNGKey(1))
        if k == 1:
            step = make_train_step(system, "diffusion", opt)
            payload = batch
        elif isinstance(k, str) and k == "gather32":
            # the TRAIN.DEVICE_DATA end state: split resident in HBM,
            # k*B int32 indices per dispatch, on-device minibatch gather
            from seeme_tpu.train import make_gather_scan_train_step

            k = 32
            data_dev = {key: jnp.broadcast_to(v[:1], (256,) + v.shape[1:])
                        for key, v in batch.items()}
            gstep = make_gather_scan_train_step(system, "diffusion", opt)
            idx = jnp.asarray(
                np.random.default_rng(0).integers(0, 256, (k, BATCH)),
                jnp.int32)
            step = lambda st, _: gstep(st, data_dev, idx)
            payload = None
        else:
            step = make_scan_train_step(system, "diffusion", opt)
            payload = {key: jnp.broadcast_to(v, (k,) + v.shape) for key, v in batch.items()}
        for _ in range(2):  # compile + warm
            state, terms = step(state, payload)
            float(terms["total"])
        n = max(steps_target // k, 10)
        r0, t0 = rss_mb(), time.perf_counter()
        for _ in range(n):
            state, terms = step(state, payload)
            float(terms["total"])
        dt, dr = time.perf_counter() - t0, rss_mb() - r0
        out[label] = {
            "dispatches": n,
            "steps": n * k,
            "wall_ms_per_step": dt / (n * k) * 1000.0,
            "wall_ms_per_dispatch": dt / n * 1000.0,
            "rss_growth_mb_per_dispatch": dr / n,
            "rss_growth_mb_per_step": dr / (n * k),
        }
        print(f"{label}: {out[label]}", flush=True)
    return out


def h2d_phase(n: int = 300):
    """Fresh host->device batch transfer per dispatch, like real training
    (run_epoch's prefetch device_puts every batch): distinguishes RSS growth
    per *transfer* from growth per *dispatch* (the device-resident-batch
    phases above showed the latter is ~1.5 KB/step, far below the 0.5-1
    MB/step long training runs exhibit)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    # ~4.3 MB payload, same order as a batch-64 stage-2 cached batch
    hosts = [rng.standard_normal((64, 60, 2, 147), dtype=np.float32)
             for _ in range(4)]
    f = jax.jit(lambda x: x.sum())
    float(f(jax.device_put(hosts[0])))
    r0, t0 = rss_mb(), time.perf_counter()
    for i in range(n):
        x = jax.device_put(hosts[i % len(hosts)])
        float(f(x))
    dt, dr = time.perf_counter() - t0, rss_mb() - r0
    return {
        "dispatches": n,
        "payload_mb": hosts[0].nbytes / 1e6,
        "wall_ms_per_dispatch": dt / n * 1000.0,
        "rss_growth_mb_per_dispatch": dr / n,
        "rss_growth_mb_total": dr,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trivial-only", action="store_true")
    ap.add_argument("--h2d-only", action="store_true")
    ap.add_argument("--gather-only", action="store_true")
    args = ap.parse_args()

    import jax

    result = {"backend": jax.default_backend(), "batch": BATCH}
    if args.h2d_only:
        result["h2d"] = h2d_phase()
        print(result["h2d"], flush=True)
    elif args.gather_only:
        result["stage2_cached_gather"] = train_phases(ks=("gather32",))
    else:
        print("trivial phase...", flush=True)
        result["trivial"] = trivial_phase()
        print(result["trivial"], flush=True)
        if not args.trivial_only:
            result["h2d"] = h2d_phase()
            print(result["h2d"], flush=True)
            result["stage2_cached"] = train_phases()

    path = os.path.join(os.path.dirname(__file__), "DISPATCH_PROBE.json")
    if os.path.exists(path):  # partial runs merge into the existing record
        with open(path) as f:
            merged = json.load(f)
        merged.update(result)
        result = merged
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
