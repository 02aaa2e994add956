"""Host->device input prefetching.

The EgoBody batches carry 20k-point scene clouds (~15 MB/batch at batch 64);
transferring them synchronously serializes H2D against the train step. JAX
device transfers are asynchronous, so keeping a small queue of already-
device_put batches overlaps the copy of batch N+1 with the compute of batch N
(the role of dataloader workers + pinned memory in the reference's torch
stack)."""

from __future__ import annotations

import collections
from typing import Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp


def prefetch_to_device(
    iterator: Iterable[Dict], size: int = 2, sharding: Optional[object] = None
) -> Iterator[Dict]:
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}
        return {k: jax.device_put(jnp.asarray(v)) for k, v in batch.items()}

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
