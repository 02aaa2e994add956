"""Worker process for tests/test_multihost.py — NOT a test module.

Runs one member of a 2-process jax.distributed CPU cluster through the real
multihost code paths: `initialize_multihost` (parallel/mesh.py:61-83), a
data-parallel train step and a gather-scan dispatch on the GLOBAL mesh, and
`allreduce_metric_sums` (the role Lightning's sync_dist plays in the
reference, SURVEY.md §2.4). Results go to a JSON file the parent asserts on.

Invocation: python multihost_worker.py <coordinator> <num_procs> <pid> <out>
"""

from __future__ import annotations

import json
import os
import sys

# run as a script: python adds tests/ to sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_procs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at import time; pin CPU
    # explicitly AFTER import (CLAUDE.md environment gotchas)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from seeme_tpu.parallel import initialize_multihost

    initialize_multihost(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs, jax.process_count()

    import numpy as np

    from seeme_tpu.core import synthetic_smpl
    from seeme_tpu.data import SyntheticEgoDataset
    from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem
    from seeme_tpu.parallel import make_mesh
    from seeme_tpu.parallel.mesh import allreduce_metric_sums
    from seeme_tpu.train import (
        create_train_state,
        make_gather_scan_train_step,
        make_optimizer,
        make_train_step,
    )

    T, B = 8, 8
    cfg = SeeMeConfig(motion_length=T, scene_points=32)
    smpl = synthetic_smpl(n_verts=64)
    data = SyntheticEgoDataset(num_samples=B, motion_length=T,
                               scene_points=32, seed=0)
    system = SeeMeSystem(cfg, smpl, data.mean, data.std)
    # identical init on every process (same key, same backend)
    params = system.init_params(jax.random.PRNGKey(0))

    mesh = make_mesh()  # spans ALL processes' devices
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())

    from seeme_tpu.parallel.mesh import batch_sharding, stacked_batch_sharding

    opt = make_optimizer("diffusion", params)
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    # replicated numpy leaves are accepted in multi-process jit (identical
    # host values on every process); SHARDED inputs must be global arrays
    # built from each process's local rows
    state = jax.tree.map(lambda x: np.asarray(x), state)
    batch_np = next(data.batches(B, shuffle=False))

    bsh = batch_sharding(mesh)
    rows = B // num_procs  # this process's slice of the global batch
    batch = {
        k: jax.make_array_from_process_local_data(
            bsh, np.asarray(v)[pid * rows:(pid + 1) * rows])
        for k, v in batch_np.items()
    }

    step = make_train_step(system, "diffusion", opt, mesh=mesh)
    state, terms = step(state, batch)
    loss1 = float(terms["inst_loss"])
    state, terms = step(state, batch)
    loss2 = float(terms["inst_loss"])

    # gather-scan dispatch: the split is replicated (numpy), the [k, B]
    # index stack is data-sharded on its batch axis
    gather = make_gather_scan_train_step(system, "diffusion", opt, mesh=mesh)
    device_data = {k: np.asarray(v) for k, v in batch_np.items()}
    idx_np = np.stack([np.arange(B, dtype=np.int32),
                       np.arange(B, dtype=np.int32)[::-1]])  # [k=2, B]
    idx = jax.make_array_from_process_local_data(
        stacked_batch_sharding(mesh),
        idx_np[:, pid * rows:(pid + 1) * rows])
    state, terms = gather(state, device_data, idx)
    gather_loss = float(terms["inst_loss"])

    # cross-process metric reduction (per-process partial sums differ by pid)
    sums, counts = allreduce_metric_sums(
        {"MPJPE": 1.0 + pid, "ROOT": 0.5 * (pid + 1)},
        {"MPJPE": 2 + pid, "ROOT": 1},
    )

    # replicated param checksum: must agree bit-for-bit across processes
    checksum = float(
        sum(np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(state.params))
    )

    with open(out_path, "w") as f:
        json.dump({
            "pid": pid,
            "process_count": jax.process_count(),
            "n_global_devices": n_global,
            "n_local_devices": n_local,
            "loss1": loss1,
            "loss2": loss2,
            "gather_loss": gather_loss,
            "metric_sums": sums,
            "metric_counts": counts,
            "param_checksum": checksum,
        }, f)


if __name__ == "__main__":
    main()
