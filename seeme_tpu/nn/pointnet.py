"""PointNet scene encoder with FC-ResNet blocks.

Reimplements `EgoHMR/models/respointnet.py:6-97` in flax: four residual FC
blocks, each followed by a global max-pool broadcast-concat, final max-pool +
ReLU + projection. This runs on SEE-ME's conditioning hot path — 20k points
per example per step (`mld.py:911-922`) — and is the natural Pallas-fusion
candidate (see `seeme_tpu/ops/pointnet_pallas.py`); this module is the
XLA-fused baseline and the weight-conversion target for the frozen ProHMR
checkpoint.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ResnetBlockFC(nn.Module):
    """relu->fc->relu->fc(zero-init) residual with optional linear shortcut
    (`respointnet.py:62-97`; fc_1 weight zero-initialized at :86)."""

    size_out: int
    size_h: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        net = nn.Dense(self.size_h, name="fc_0")(nn.relu(x))
        dx = nn.Dense(self.size_out, kernel_init=nn.initializers.zeros, name="fc_1")(
            nn.relu(net)
        )
        if x.shape[-1] == self.size_out:
            xs = x
        else:
            xs = nn.Dense(self.size_out, use_bias=False, name="shortcut")(x)
        return xs + dx


class ResnetPointnet(nn.Module):
    out_dim: int = 512
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        """(B, N, 3) point cloud -> (B, out_dim) embedding."""
        h = self.hidden_dim
        net = nn.Dense(2 * h, name="fc_pos_0")(points)
        net = ResnetBlockFC(h, h, name="block_0")(net)
        for i in (1, 2):
            pooled = jnp.max(net, axis=1, keepdims=True)
            net = jnp.concatenate([net, jnp.broadcast_to(pooled, net.shape)], axis=-1)
            net = ResnetBlockFC(h, h, name=f"block_{i}")(net)
        pooled = jnp.max(net, axis=1, keepdims=True)
        net = jnp.concatenate([net, jnp.broadcast_to(pooled, net.shape)], axis=-1)
        net = ResnetBlockFC(h, h, name="block_3")(net)
        net = jnp.max(net, axis=1)
        return nn.Dense(self.out_dim, name="fc_c")(nn.relu(net))
