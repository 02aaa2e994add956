"""Single-point A/B of the q|k|v weight fusion at the protocol shape.

Measures ONE ddim_fused window (B=64, n_cond=2, 50 steps) in THIS process —
run it twice back-to-back with SEEME_QKV_FUSE=0 / =1 so both sides see the
same relay/chip conditions (the r4-vs-r5 sweep comparison confounded the
fusion with day-to-day relay drift). Appends a row to scripts/QKV_AB.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seeme_tpu.core import synthetic_smpl
    from seeme_tpu.data import SyntheticEgoDataset
    from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem
    from seeme_tpu.ops import denoiser_fused as df

    B = int(os.environ.get("QKV_AB_BATCH", "64"))
    variant = os.environ.get("QKV_AB_VARIANT", "loop")
    guidance = float(os.environ.get("QKV_AB_GUIDANCE", "1.0"))
    cfg = SeeMeConfig()
    smpl = synthetic_smpl(n_verts=64)
    data = SyntheticEgoDataset(num_samples=4, motion_length=cfg.motion_length,
                               scene_points=64, seed=0)
    system = SeeMeSystem(cfg, smpl, data.mean, data.std)
    params = system.init_params(jax.random.PRNGKey(0))
    tsa, acp_t, acp_prev = df.ddim_schedule_arrays(system.schedule, 50)

    n_cfg = 2 if guidance > 1.0 else 1
    cond = jnp.asarray(np.random.RandomState(0).randn(n_cfg * B, 2, 256),
                       jnp.float32)
    z0 = jnp.asarray(np.random.RandomState(1).randn(B, 1, 256), jnp.float32)
    impl = df.ddim_fused_grid if variant == "grid" else df.ddim_fused
    fn = jax.jit(lambda c, z: impl(
        params["denoiser"], c, z, tsa, acp_t, acp_prev, num_steps=50,
        guidance_scale=guidance))

    out = fn(cond, z0)
    float(jnp.sum(out))  # compile + sync
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(cond, z0)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / 20)

    row = {"fuse": df.QKV_FUSE, "ablate_vpu": df.ABLATE_VPU,
           "variant": variant, "batch": B,
           "guidance": guidance, "ms": best * 1e3,
           "stamp": time.strftime("%Y-%m-%dT%H:%M:%S")}
    # anchor to the repo (not cwd) and never lose a measured row to a
    # truncated existing file or a mid-write crash
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "QKV_AB.json")
    try:
        with open(path) as f:
            rows = json.load(f)
    except (OSError, ValueError):
        rows = []
    rows.append(row)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f, indent=1)
    os.replace(tmp, path)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
