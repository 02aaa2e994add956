"""Device mesh construction and sharding rules.

The reference's only parallelism is PyTorch-Lightning DDP over NCCL
(`train.py:127-139`, SURVEY.md §2.4). The TPU-native equivalent: one jitted
train step over a `jax.sharding.Mesh` with the batch sharded on the ``data``
axis; XLA inserts the gradient all-reduce over ICI. A ``model`` axis exists in
the mesh so tensor-parallel shardings can be introduced without an API change,
but every shipped model is small enough that it stays size 1.

Multi-host (multi-slice over DCN) initialization goes through
`jax.distributed.initialize` before mesh construction; `make_mesh` only sees
the global device list either way.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: Optional[int] = None,
    model_axis: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis is None:
        data_axis = n // model_axis
    assert data_axis * model_axis == n, (data_axis, model_axis, n)
    arr = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis of every batch leaf sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for k-step dispatch stacks [k, B, ...]: the scan axis stays
    whole on every device, the per-step batch axis is data-sharded."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Params / opt-state / schedule constants: replicated everywhere."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (multi-slice) initialization.

    The reference's multi-node story is Lightning DDP env plumbing; here a
    single `jax.distributed.initialize` call before mesh construction makes
    `jax.devices()` span all hosts — DCN handles inter-slice traffic, ICI
    intra-slice, with no further code changes (SURVEY.md §2.4). On TPU pods
    the arguments are auto-detected from the environment; pass them only for
    CPU/GPU clusters."""
    import jax

    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def allreduce_metric_sums(sums, counts):
    """Sum per-host metric accumulators across processes.

    Plays the role of Lightning's `sync_dist=True` on the reference's
    metric logs (SURVEY.md §2.4): each host evaluates its shard of the test
    set, then the (sum, count) pairs are summed over `jax.process_count()`
    processes so every host computes identical means. Single-process: no-op.
    All hosts must carry the same key set (they do — keys are determined by
    the metric class, and filtered-out sequences still leave the key present
    once any sequence passed; hosts disagree only if one filtered *all*
    sequences, in which case pre-seed the accumulator)."""
    import jax

    if jax.process_count() == 1:
        return dict(sums), dict(counts)
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(sums)
    vec = np.asarray(
        [sums[k] for k in keys] + [float(counts[k]) for k in keys], np.float32
    )
    total = np.asarray(multihost_utils.process_allgather(vec)).sum(axis=0)
    n = len(keys)
    return (
        {k: float(total[i]) for i, k in enumerate(keys)},
        {k: int(round(float(total[n + i]))) for i, k in enumerate(keys)},
    )
