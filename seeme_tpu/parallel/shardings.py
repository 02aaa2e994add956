"""Parameter sharding rules for the (data, model) mesh.

The reference needs only data parallelism (models are tens of M params,
SURVEY.md §2.4), but the mesh API is built so tensor parallelism is a config
change, not a rewrite: `infer_param_shardings` partitions large kernels over
the ``model`` axis (column-parallel on the output dimension — XLA inserts the
all-gathers/reduce-scatters), leaving everything else replicated. With
model_axis=1 every rule degenerates to replication, so the default single-
and multi-chip data-parallel paths are unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernels at least this wide on their output axis get column-sharded
MIN_SHARD_DIM = 512


def infer_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching `params`' structure."""
    model_size = mesh.shape.get("model", 1)

    def rule(x):
        if model_size > 1 and hasattr(x, "ndim") and x.ndim >= 2:
            out_dim = x.shape[-1]
            if out_dim >= MIN_SHARD_DIM and out_dim % model_size == 0:
                spec = [None] * (x.ndim - 1) + ["model"]
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place parameters onto the mesh according to the inferred rules."""
    shardings = infer_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
