"""Length / padding mask helpers (static-shape, jit-friendly).

The reference builds boolean frame masks from Python length lists
(`mld/utils/temos_utils.py:10-17`). Here lengths are arrays and the max
length is a static int so everything traces once under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) bool mask, True for valid frames."""
    lengths = jnp.asarray(lengths)
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]
