"""ST-GCN action-recognition evaluator (UESTC).

TPU-native counterpart of the reference's pretrained UESTC recognition model
(`mld/models/architectures/uestc_stgcn.py:8-111` STGCN, `:135-210` st_gcn
block, `:354-411` ConvTemporalGraphical, `:212-352` Graph) used by
`mld/models/metrics/stgcn.py:32-46` with in_channels=6 (rot6d per joint),
the 'smpl' layout and the 'spatial' partition strategy.

Design differences from the reference:
  * activations live in (N, T, V, C) — channels-last for XLA's TPU conv
    layouts — instead of torch's (N, C, T, V);
  * the SMPL graph comes from the framework's own PARENTS table
    (`core/smpl.py`) instead of unpickling `kintree_table.pkl`;
  * inference-only: BatchNorms apply converted running statistics as affine
    transforms (the evaluator is always frozen, `metrics/stgcn.py:46-49`).

Weights: convert the released `uestc_rot6d_stgcn.tar` with
`tools/convert_checkpoint.py --kind uestc_stgcn`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.smpl import PARENTS

__all__ = ["STGCN", "smpl_spatial_adjacency"]

# (out_channels, temporal_stride) of the 10 st_gcn blocks
# (`uestc_stgcn.py:48-59`); block 0 has no residual branch.
_BLOCKS = ((64, 1), (64, 1), (64, 1), (64, 1), (128, 2),
           (128, 1), (128, 1), (256, 2), (256, 1), (256, 1))


def _normalize_digraph(a: np.ndarray) -> np.ndarray:
    deg = a.sum(0)
    dn = np.where(deg > 0, 1.0 / np.maximum(deg, 1e-12), 0.0)
    return a * dn[None, :]


def smpl_spatial_adjacency() -> np.ndarray:
    """(K=3, 24, 24) spatial-partition adjacency over the SMPL kinematic
    tree (`uestc_stgcn.py:309-352`, strategy='spatial', max_hop=1,
    center=pelvis).

    Parity quirk preserved: the reference measures each node's distance to
    the center on the SAME max_hop=1 hop matrix, so that distance is 0
    (pelvis), 1 (its direct children), or inf (everything else) — NOT the
    tree depth. Two adjacent deep joints therefore compare inf == inf and
    land in the 'root' partition."""
    V = 24
    adj = np.eye(V)
    for j in range(1, V):
        p = int(PARENTS[j])
        adj[j, p] = adj[p, j] = 1.0
    hop = np.where(np.eye(V, dtype=bool), 0.0, np.where(adj > 0, 1.0, np.inf))
    norm = _normalize_digraph((hop <= 1).astype(np.float64))
    to_center = hop[:, 0]  # 0 / 1 / inf

    parts = []
    for h in (0, 1):
        a_root = np.zeros((V, V))
        a_close = np.zeros((V, V))
        a_further = np.zeros((V, V))
        for i in range(V):
            for j in range(V):
                if hop[j, i] != h:
                    continue
                if to_center[j] == to_center[i]:
                    a_root[j, i] = norm[j, i]
                elif to_center[j] > to_center[i]:
                    a_close[j, i] = norm[j, i]
                else:
                    a_further[j, i] = norm[j, i]
        if h == 0:
            parts.append(a_root)
        else:
            parts.extend([a_root + a_close, a_further])
    return np.stack(parts).astype(np.float32)


class _FrozenBN(nn.Module):
    """Converted torch BatchNorm applied as affine (inference-only)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class _GraphConv(nn.Module):
    """ConvTemporalGraphical (`uestc_stgcn.py:354-411`): 1x1 conv to K*C'
    then contraction with the (K, V, V) partition adjacency."""

    out_channels: int
    K: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
        # x: (N, T, V, C) -> (N, T, V, K, C')
        y = nn.Conv(self.out_channels * self.K, (1, 1), name="conv")(x)
        N, T, V, _ = y.shape
        y = y.reshape(N, T, V, self.K, self.out_channels)
        return jnp.einsum("ntvkc,kvw->ntwc", y, A)


class _StGcnBlock(nn.Module):
    """st_gcn (`uestc_stgcn.py:135-210`): graph conv -> BN/ReLU -> (9,1)
    temporal conv -> BN, plus residual, ReLU."""

    out_channels: int
    stride: int
    residual: bool
    K: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        if not self.residual:
            res = 0.0
        elif in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, 1),
                          name="res_conv")(x)
            res = _FrozenBN(self.out_channels, name="res_bn")(res)
        y = _GraphConv(self.out_channels, self.K, name="gcn")(x, A)
        y = _FrozenBN(self.out_channels, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (9, 1), strides=(self.stride, 1),
                    padding=((4, 4), (0, 0)), name="tcn")(y)
        y = _FrozenBN(self.out_channels, name="bn2")(y)
        return nn.relu(y + res)


class STGCN(nn.Module):
    """UESTC recognition model.

    __call__(motion (N, T, V=24, C=6 rot6d), lengths optional)
      -> (logits (N, num_class), features (N, 256))
    features are the globally average-pooled block-10 activations — the FID
    embedding (`uestc_stgcn.py:100-111`); padded frames are excluded from
    the pooling when lengths are given (the reference's TODO'd mask).
    """

    num_class: int = 40
    in_channels: int = 6

    @nn.compact
    def __call__(
        self, motion: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        A = jnp.asarray(smpl_spatial_adjacency())
        K, V, _ = A.shape
        N, T, _, C = motion.shape

        # data_bn over the (V*C,) per-frame vector (`uestc_stgcn.py:46, 86-90`)
        x = motion.reshape(N, T, V * C)
        x = _FrozenBN(V * C, name="data_bn")(x)
        x = x.reshape(N, T, V, C)

        for i, (out, stride) in enumerate(_BLOCKS):
            importance = self.param(
                f"edge_importance_{i}", nn.initializers.ones, (K, V, V)
            )
            x = _StGcnBlock(out, stride, residual=i > 0, K=K,
                            name=f"block_{i}")(x, A * importance)

        if lengths is None:
            feats = x.mean(axis=(1, 2))
        else:
            # the two stride-2 blocks downsample T by 4; average only over
            # the frames that carry valid data
            t_out = x.shape[1]
            frame = jnp.arange(t_out)[None, :]
            n_valid = jnp.ceil(lengths[:, None] * (t_out / T))
            w = (frame < n_valid).astype(x.dtype)[:, :, None, None]
            feats = (x * w).sum(axis=(1, 2)) / (
                w.sum(axis=(1, 2)) * x.shape[2]
            ).clip(1e-6)
        logits = nn.Dense(self.num_class, name="fcn")(feats)
        return logits, feats
