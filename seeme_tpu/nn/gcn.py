"""Modulated graph convolution over the SMPL 24-joint skeleton.

Reimplements `EgoHMR/models/egohmr/modulated_gcn/` (ModulatedGraphConv,
_GraphConv, _ResGraphConv, ModulatedGCN). The graph is dense 24x24 — on TPU
these are ordinary small matmuls; the adjacency is a static constant built
from the SMPL kinematic tree exactly as `egohmr.py:94-101` builds it
(symmetrize, row-normalize without self-loops, then re-add identity).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.smpl import PARENTS

xavier_gain = nn.initializers.variance_scaling(1.414**2, "fan_avg", "uniform")


def smpl_adjacency() -> np.ndarray:
    """24x24 normalized adjacency (`egohmr.py:94-101` with SMPL_EDGES =
    (parent, child) pairs of the kinematic tree, `other_utils.py:86+`)."""
    A = np.zeros((24, 24), np.float32)
    for child in range(1, 24):
        A[PARENTS[child], child] = 1.0
    A = np.maximum(A, A.T)  # symmetrize
    rowsum = A.sum(1)
    r_inv = np.where(rowsum > 0, 1.0 / np.maximum(rowsum, 1e-12), 0.0)
    A = A * r_inv[:, None]  # row-normalize
    eye = np.eye(24, dtype=np.float32)
    return A * (1 - eye) + eye


class ModulatedGraphConv(nn.Module):
    """`modulated_gcn_conv.py:15-51`: two weight branches (self vs neighbor),
    per-joint modulation M, learnable adjacency perturbation adj2."""

    out_features: int
    adj: np.ndarray  # (J, J) static base adjacency

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, J, D)
        J = self.adj.shape[0]
        D = x.shape[-1]
        W = self.param("W", xavier_gain, (2, D, self.out_features))
        M = self.param("M", xavier_gain, (J, self.out_features))
        adj2 = self.param("adj2", nn.initializers.constant(1e-6), (J, J))
        bias = self.param(
            "bias",
            nn.initializers.uniform(scale=2.0 / np.sqrt(self.out_features)),
            (self.out_features,),
        )

        h0 = x @ W[0]
        h1 = x @ W[1]
        adj = jnp.asarray(self.adj) + adj2
        adj = (adj.T + adj) / 2
        eye = jnp.eye(J)
        out = (adj * eye) @ (M * h0) + (adj * (1 - eye)) @ (M * h1)
        return out + bias


class GraphConvBlock(nn.Module):
    """gconv -> batchnorm(features) -> relu (`modulated_gcn.py:8-28`)."""

    out_features: int
    adj: np.ndarray

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ModulatedGraphConv(self.out_features, self.adj, name="gconv")(x)
        # BatchNorm1d over channels, statistics across (batch, joints)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis=-1, name="bn",
        )(x)
        return nn.relu(x)


class ResGraphConv(nn.Module):
    hid_features: int
    adj: np.ndarray

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = GraphConvBlock(self.hid_features, self.adj, name="gconv1")(x, train)
        out = GraphConvBlock(self.hid_features, self.adj, name="gconv2")(out, train)
        return x + out


class ModulatedGCN(nn.Module):
    """`modulated_gcn.py:61-119` (non-local layer off, as shipped)."""

    adj: np.ndarray
    hid_dim: int = 1024
    out_dim: int = 6
    num_layers: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = GraphConvBlock(self.hid_dim, self.adj, name="gconv_input")(x, train)
        for i in range(self.num_layers):
            x = ResGraphConv(self.hid_dim, self.adj, name=f"res_{i}")(x, train)
        return ModulatedGraphConv(self.out_dim, self.adj, name="gconv_output")(x)
