#!/usr/bin/env python
"""On-chip Pallas kernel smoke: fused vs bit-faithful numerics on real TPU.

tests/test_pallas_ops.py necessarily runs the kernels in interpret mode on
CPU; this script is the artifact that ties the perf claims to the actual
chip. It runs the fused DDIM reverse kernel (`ops/denoiser_fused.py`) and the
fused PointNet (`ops/pointnet_pallas.py`) on the default backend, compares
against the XLA scan / flax paths on the same chip, and prints one JSON line
with the measured deltas. Exits non-zero if drift exceeds the documented
envelopes (fused sampler: bf16-resident weights, ~1% of latent scale;
PointNet: f32, 1e-3 relative).

Run: python scripts/tpu_smoke.py   (latest result: scripts/TPU_SMOKE.json)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seeme_tpu.diffusion import DiffusionSchedule
    from seeme_tpu.models import Denoiser
    from seeme_tpu.nn.pointnet import ResnetPointnet
    from seeme_tpu.ops import denoiser_fused as df
    from seeme_tpu.ops.pointnet_pallas import pointnet_forward_pallas

    backend = jax.default_backend()
    result = {"backend": backend, "n_devices": len(jax.devices())}

    # ---- fused DDIM reverse vs XLA scan (flagship shapes, small batch)
    den = Denoiser(nfeats=75, md_trans=True)
    B, D, NS = 8, 256, 50
    rng = np.random.RandomState(0)
    z0 = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    cond = jnp.asarray(rng.randn(B, 2, D).astype(np.float32))
    params = den.init(jax.random.PRNGKey(0), z0, jnp.zeros((B,), jnp.int32), cond)
    params = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.PRNGKey(7), a.shape),
        params,
    )
    sched = DiffusionSchedule()

    @jax.jit
    def scan_path(params, z0, cond):
        ts = sched.ddim_timesteps(NS)
        z = z0
        for t in ts:  # unrolled: same graph the sampler's lax.scan computes
            pred = den.apply(params, z, jnp.full((B,), t), cond)
            z = sched.ddim_step(pred, jnp.asarray(t), z, NS)
        return z

    tsa, acp_t, acp_prev = df.ddim_schedule_arrays(sched, NS)

    @jax.jit
    def fused_path(params, z0, cond):
        return df.ddim_fused(params, cond, z0, tsa, acp_t, acp_prev,
                             num_steps=NS)

    z_scan = np.asarray(scan_path(params, z0, cond))
    z_fused = np.asarray(fused_path(params, z0, cond))
    scale = np.abs(z_scan).max()
    ddim_rel = float(np.abs(z_fused - z_scan).max() / scale)
    result["ddim_fused_max_rel_dev"] = round(ddim_rel, 5)
    result["ddim_envelope"] = 0.02

    # ---- fused PointNet vs flax (ProHMR config)
    pn = ResnetPointnet(out_dim=512, hidden_dim=256)
    pts = jnp.asarray(rng.randn(4, 4096, 3).astype(np.float32))
    pn_params = pn.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 3)))
    ref = np.asarray(jax.jit(pn.apply)(pn_params, pts))
    fused = np.asarray(jax.jit(
        lambda p, x: pointnet_forward_pallas(p, x))(pn_params, pts))
    pn_rel = float(np.abs(fused - ref).max() / (np.abs(ref).max() + 1e-9))
    result["pointnet_fused_max_rel_dev"] = round(pn_rel, 6)
    result["pointnet_envelope"] = 1e-3

    ok = ddim_rel < 0.02 and pn_rel < 1e-3
    result["ok"] = ok
    line = json.dumps(result)
    print(line)
    with open(os.path.join(os.path.dirname(__file__), "TPU_SMOKE.json"), "w") as f:
        f.write(line + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
