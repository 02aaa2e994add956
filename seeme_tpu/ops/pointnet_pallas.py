"""Pallas TPU kernel: fused PointNet residual block + tile max-pool.

The 20k-point scene encoder is SEE-ME's conditioning hot path (SURVEY.md
hard-parts #8). The XLA version (`nn/pointnet.py`) already avoids concat
materialization; what XLA still can't avoid is writing every intermediate
matmul result (net, dx, shortcut) of each residual block to HBM. This kernel
computes one whole SplitResnetBlockFC per point-tile in VMEM:

    hx = relu(x);  net = hx @ W0x + c0          (c0 = relu(pooled) @ W0p + b0)
    dx = relu(net) @ W1 + b1
    out = x @ Wsx + cs + dx                     (cs = pooled @ Wsp)

reading x once and writing out once (plus a per-tile running max used for the
next block's global pool) — ~2.5x less HBM traffic per block. The per-batch
pooled contributions (c0, cs) are folded outside the kernel: they are
(B, 512) matmuls, negligible.

Matmuls use preferred_element_type=float32 so bf16 inputs accumulate in f32
on the MXU.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pick_tile(n: int) -> int:
    """Largest sublane-aligned (multiple of 8) tile that divides n."""
    for t in (512, 400, 256, 200, 128, 100, 80, 40, 16, 8):
        if n % t == 0 and t % 8 == 0:
            return t
    raise ValueError(f"point count {n} has no 8-aligned divisor tile")


def _block_kernel(x_ref, c0_ref, cs_ref, w0_ref, w1_ref, ws_ref, out_ref, max_ref):
    x = x_ref[0]  # (TILE, H)
    c0 = c0_ref[0]  # (1, H) pooled fc0 contribution + bias
    cs = cs_ref[0]  # (1, H) pooled shortcut contribution

    hx = jnp.maximum(x, 0.0)
    net = jnp.dot(hx, w0_ref[:], preferred_element_type=jnp.float32) + c0
    dx = jnp.dot(jnp.maximum(net, 0.0), w1_ref[:], preferred_element_type=jnp.float32)
    out = jnp.dot(x, ws_ref[:], preferred_element_type=jnp.float32) + cs + dx
    out = out.astype(out_ref.dtype)
    out_ref[0] = out
    # (8, H) broadcast of the tile max — 8 sublanes to satisfy TPU tiling
    max_ref[0] = jnp.broadcast_to(jnp.max(out, axis=0, keepdims=True), (8, out.shape[-1]))


@functools.partial(jax.jit, static_argnames=())
def fused_split_block(
    x: jnp.ndarray,        # (B, N, H) block input
    pooled: jnp.ndarray,   # (B, H) global max of x
    w0x: jnp.ndarray, w0p: jnp.ndarray, b0: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    wsx: jnp.ndarray, wsp: jnp.ndarray,
):
    """Returns (out (B, N, H), out_max (B, H))."""
    B, N, H = x.shape
    TILE = _pick_tile(N)
    n_tiles = N // TILE

    # per-batch pooled contributions, folded once
    c0 = (jnp.maximum(pooled, 0.0) @ w0p + b0)[:, None, :]  # (B, 1, H)
    cs = (pooled @ wsp)[:, None, :]
    # fold b1 into the shortcut constant (added once per output)
    cs = cs + b1[None, None, :]

    out, tile_max = pl.pallas_call(
        _block_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, H), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE, H), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, H), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, H), x.dtype),
            jax.ShapeDtypeStruct((B, n_tiles * 8, H), x.dtype),
        ),
    )(x, c0, cs, w0x, w1, wsx)
    return out, jnp.max(tile_max, axis=1)


def _input_kernel(pts_ref, wpos_ref, bpos_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                  ws_ref, out_ref, max_ref):
    """fc_pos (3 -> 2H) + block_0 (2H -> H) fused: the (TILE, 2H) embedding
    lives only in VMEM and is never written to HBM."""
    pts = pts_ref[0]  # (TILE, 3pad)
    h = jnp.dot(pts, wpos_ref[:], preferred_element_type=jnp.float32) + bpos_ref[0]
    hx = jnp.maximum(h, 0.0)
    net = jnp.dot(hx, w0_ref[:], preferred_element_type=jnp.float32) + b0_ref[0]
    dx = jnp.dot(jnp.maximum(net, 0.0), w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    out = jnp.dot(h, ws_ref[:], preferred_element_type=jnp.float32) + dx
    out = out.astype(out_ref.dtype)
    out_ref[0] = out
    max_ref[0] = jnp.broadcast_to(jnp.max(out, axis=0, keepdims=True), (8, out.shape[-1]))


def fused_input_block(points, wpos, bpos, w0, b0, w1, b1, ws):
    """(B, N, 3) points -> (block_0 output (B, N, H), its max (B, H))."""
    B, N, _ = points.shape
    H = w1.shape[-1]
    H2 = wpos.shape[-1]
    TILE = _pick_tile(N)
    n_tiles = N // TILE
    # pad the 3-wide coordinate axis to a full lane tile
    pts = jnp.pad(points, ((0, 0), (0, 0), (0, 128 - points.shape[-1])))
    wpos_p = jnp.pad(wpos, ((0, 128 - wpos.shape[0]), (0, 0)))

    out, tile_max = pl.pallas_call(
        _input_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, H2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE, H), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, H), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, H), points.dtype),
            jax.ShapeDtypeStruct((B, n_tiles * 8, H), points.dtype),
        ),
    )(pts, wpos_p, bpos[None], w0, b0[None], w1, b1[None], ws)
    return out, jnp.max(tile_max, axis=1)


def _pointnet_forward_xla(params: Dict, points: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA twin of the pallas forward (same params/same math) — used as
    the VJP rule so the fused kernels stay differentiable (ProHMR trains
    through the scene encoder, `prohmr_scene.py:74-77`)."""
    p = params["params"]

    def dense(name, x, sub=None, bias=True):
        w = sub[name] if sub is not None else p[name]
        out = x @ w["kernel"]
        return out + w["bias"] if (bias and "bias" in w) else out

    h = dense("fc_pos_0", points)
    b0 = p["block_0"]
    net = jax.nn.relu(h) @ b0["fc_0"]["kernel"] + b0["fc_0"]["bias"]
    dx = jax.nn.relu(net) @ b0["fc_1"]["kernel"] + b0["fc_1"]["bias"]
    x = h @ b0["shortcut"]["kernel"] + dx
    for i in (1, 2, 3):
        bp = p[f"block_{i}"]
        pooled = jnp.max(x, axis=1, keepdims=True)
        net = (
            jax.nn.relu(x) @ bp["fc_0_x"]["kernel"]
            + jax.nn.relu(pooled) @ bp["fc_0_p"]["kernel"]
            + bp["fc_0_x"]["bias"]
        )
        dx = jax.nn.relu(net) @ bp["fc_1"]["kernel"] + bp["fc_1"]["bias"]
        x = x @ bp["shortcut_x"]["kernel"] + pooled @ bp["shortcut_p"]["kernel"] + dx
    net = jax.nn.relu(jnp.max(x, axis=1))
    return net @ p["fc_c"]["kernel"] + p["fc_c"]["bias"]


@jax.custom_vjp
def pointnet_forward_pallas(params: Dict, points: jnp.ndarray) -> jnp.ndarray:
    """Full ResnetPointnet forward using the fused kernels. `params` is the
    flax param dict of `nn.pointnet.ResnetPointnet` (numerics match `apply`
    to f32 tolerance). Differentiable: the backward pass rematerializes
    through the XLA twin (identical math)."""
    return _pointnet_forward_impl(params, points)


def _pointnet_fwd(params, points):
    return _pointnet_forward_impl(params, points), (params, points)


def _pointnet_bwd(res, g):
    params, points = res
    _, vjp = jax.vjp(_pointnet_forward_xla, params, points)
    return vjp(g)


pointnet_forward_pallas.defvjp(_pointnet_fwd, _pointnet_bwd)


# Canonical per-kernel batch: Mosaic compile time grows with the grid's
# program count, and the (64, 50)-grid executable for batch 64 x 20k points
# took 20-40 min through the axon remote-compile tunnel while (16, 50) takes
# ~2 min (BASELINE.md compile-time note). Larger batches therefore run as a
# lax.map over fixed 16-row chunks: the Pallas kernel is compiled ONCE at
# the chunk shape and reused, making flagship-batch (64) scene training
# reachable in batch-16 compile time. The grid is sequential on one core, so
# chunking costs no parallelism.
BATCH_CHUNK = 16


def _pointnet_forward_impl(params: Dict, points: jnp.ndarray) -> jnp.ndarray:
    B = points.shape[0]
    if B > BATCH_CHUNK and B % BATCH_CHUNK == 0:
        chunks = points.reshape(B // BATCH_CHUNK, BATCH_CHUNK, *points.shape[1:])
        out = jax.lax.map(
            lambda c: _pointnet_forward_chunk(params, c), chunks)
        return out.reshape(B, out.shape[-1])
    return _pointnet_forward_chunk(params, points)


def _pointnet_forward_chunk(params: Dict, points: jnp.ndarray) -> jnp.ndarray:
    p = params["params"]
    b0 = p["block_0"]
    x, pooled = fused_input_block(
        points,
        p["fc_pos_0"]["kernel"], p["fc_pos_0"]["bias"],
        b0["fc_0"]["kernel"], b0["fc_0"]["bias"],
        b0["fc_1"]["kernel"], b0["fc_1"]["bias"],
        b0["shortcut"]["kernel"],
    )
    for i in (1, 2, 3):
        bp = p[f"block_{i}"]
        x, pooled = fused_split_block(
            x, pooled,
            bp["fc_0_x"]["kernel"], bp["fc_0_p"]["kernel"], bp["fc_0_x"]["bias"],
            bp["fc_1"]["kernel"], bp["fc_1"]["bias"],
            bp["shortcut_x"]["kernel"], bp["shortcut_p"]["kernel"],
        )
    net = jax.nn.relu(pooled)
    return net @ p["fc_c"]["kernel"] + p["fc_c"]["bias"]
