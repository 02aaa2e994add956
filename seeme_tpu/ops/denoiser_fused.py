"""Fully-fused DDIM sampling: the entire reverse process in one Pallas kernel.

The latent denoiser is tiny (5 MD layers, d=256, <= 6 tokens) — at batch 64
one step is ~40 micro-ops and XLA spends ~110 us/step on dispatch and HBM
round-trips, so the 50-step scan costs ~5.7 ms. This module runs the WHOLE
loop inside one Pallas program: every weight is loaded into VMEM once
(bf16, ~12.5 MB), the 50 steps execute from VMEM with zero HBM traffic, and
the only outputs are the final latents.

Structure:
  * `denoiser_apply_pure(params, x, timesteps, cond)` — a pure-jnp twin of
    `models/denoiser.Denoiser` covering BOTH block types (md_trans stylization
    and the plain token-concat path) and the emb_proj condition projection,
    consuming the flax param pytree directly; parity-tested vs `Denoiser.apply`.
  * `ddim_fused(params, cond, z0, ...)` — pallas_call whose kernel unflattens
    the params from VMEM refs and runs `fori_loop(num_steps)` of
    [denoiser + CFG mix + DDIM update] (eta=0) entirely on-chip.

Used by `SeeMeSystem.sample` / `T2MSystem.sample` on TPU; the scan-based XLA
path remains the bit-faithful reference implementation and the fallback
(bf16 weight residency costs ~0.8% latent deviation at guidance 1, scaling
roughly linearly with the guidance factor).
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# A/B toggle for the q|k|v weight fusion (read at trace time; fresh process
# per setting): scripts/ddim_roofline.py measures both.
import os as _os

QKV_FUSE = _os.environ.get("SEEME_QKV_FUSE", "0") == "1"
# Diagnostic ONLY (breaks numerics): replace every layernorm/softmax in the
# T=1 fused path with cheap elementwise stand-ins of identical shape, so a
# measured run isolates Mosaic's matmul-chain time from the VPU chain
# (BASELINE.md roofline section). Never set outside scripts/qkv_ab.py runs.
ABLATE_VPU = _os.environ.get("SEEME_ABLATE_VPU", "0") == "1"


# --------------------------------------------------------------- pure forward

def _layer_norm(x, scale, bias, eps=1e-5):  # matches flax/torch LayerNorm eps
    if ABLATE_VPU:  # diagnostic: same shapes/dtypes, no reductions
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale.astype(x.dtype) + bias.astype(x.dtype)


# Round-5 A/B (scripts/QKV_AB.json): moving the LN mean/var and the wide-
# softmax lane-sum onto the MXU as (R, D)x(D, 1) matmuls measured EXACTLY
# the full kernel's 2.89 ms at B=64 — while ablating the ops outright gives
# 2.21 ms. The ~0.6 ms/window is the SERIAL DEPENDENCY latency of ~31
# norm/softmax points per step, not reduce-tree throughput: it is paid on
# whichever unit computes them, so the plain VPU forms stay (simplest,
# bit-closest to the scan).
def _softmax(x, axis=-1):
    if ABLATE_VPU:  # diagnostic: no exp/reduce, magnitude roughly bounded
        return x * (1.0 / x.shape[axis])
    return jax.nn.softmax(x, axis=axis)


def _dense(p, x):
    """(..., Din) @ (Din, Dout) as a 2-D matmul (Mosaic-friendly).

    Follows the weight dtype: with bf16-resident weights (the fused kernel)
    the activation is cast to bf16 at the matmul input with f32 accumulation
    — the same arithmetic XLA's default-precision f32 matmul performs."""
    shape = x.shape
    w = p["kernel"]
    out = jnp.dot(
        x.reshape(-1, shape[-1]).astype(w.dtype), w,
        preferred_element_type=jnp.float32,
    ) + p["bias"].astype(jnp.float32)
    return out.reshape(shape[:-1] + (w.shape[-1],))


def _block_ids(n_rows: int, block: int):
    """Row-block ids via int32 iota (Mosaic-legal)."""
    ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_rows), 0)
    return ids // block


def _mha_1head(p, x, key_mask_add=None):
    """Single-head self-attention over a short token axis (B, S, D).

    Mosaic cannot lower batched dot_generals, so per-sample attention is one
    block-diagonal-masked (B*S, B*S) matmul pair: rows attend only within
    their own sample's S-token block (additive -1e9 off-block), which is
    exactly per-sample softmax attention but runs on the MXU.

    key_mask_add (B, S) f32 additive (0 valid / -1e9 padded) excludes padded
    condition tokens as attention KEYS in every layer, matching the flax
    path's `key_valid_mask` (`models/denoiser.py:183-188`); padded rows still
    produce (unused) outputs, which is exactly the flax semantics too.
    A pre-flattened (1, B*S) mask is also accepted — inside a Pallas kernel
    the (B, S) -> (1, B*S) reshape is a sublane->lane shape cast Mosaic
    cannot lower, so kernel callers flatten XLA-side."""
    B, S, D = x.shape
    if "qkv_proj" in p:
        # pre-fused q|k|v kernel (`_fuse_qkv`): one (B*S, D)x(D, 3D) MXU op
        # instead of three — identical per-column accumulation
        qkv = _dense(p["qkv_proj"], x).reshape(B * S, 3 * D)
        q = jax.lax.slice_in_dim(qkv, 0, D, axis=1)
        k = jax.lax.slice_in_dim(qkv, D, 2 * D, axis=1)
        v = jax.lax.slice_in_dim(qkv, 2 * D, 3 * D, axis=1)
    else:
        q = _dense(p["q_proj"], x).reshape(B * S, D)
        k = _dense(p["k_proj"], x).reshape(B * S, D)
        v = _dense(p["v_proj"], x).reshape(B * S, D)
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) / math.sqrt(D)
    row = _block_ids(B * S, S)
    logits = jnp.where(row == row.T, logits, -1e9)
    if key_mask_add is not None:
        if key_mask_add.shape != (1, B * S):
            key_mask_add = key_mask_add.reshape(1, B * S)
        logits = logits + key_mask_add
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.dot(
        attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).reshape(B, S, D)
    return _dense(p["out_proj"], out)


def _encoder_layer(p, x, activation="relu", key_mask_add=None):
    """Post-norm TransformerEncoderLayer (relu ff in the MD sa_block; gelu in
    the plain denoiser path, `configs/modules/denoiser.yaml`)."""
    # tanh-approx gelu: Pallas TPU lowering has no erf/erfc primitive; the
    # deviation is below this kernel's bf16 noise floor (module docstring)
    act = jax.nn.relu if activation == "relu" else functools.partial(
        jax.nn.gelu, approximate=True
    )
    x = _layer_norm(x + _mha_1head(p["self_attn"], x, key_mask_add),
                    p["norm1"]["scale"], p["norm1"]["bias"])
    h = _dense(p["linear2"], act(_dense(p["linear1"], x)))
    return _layer_norm(x + h, p["norm2"]["scale"], p["norm2"]["bias"])


def _stylization(p, h, emb):
    eo = _dense(p["emb_linear"], jax.nn.silu(emb))[:, None, :]
    scale, shift = jnp.split(eo, 2, axis=-1)
    h = _layer_norm(h, p["norm"]["scale"], p["norm"]["bias"]) * (1 + scale) + shift
    return _dense(p["out_linear"], jax.nn.silu(h))


def md_step_invariants(p_enc, xf, num_layers: int,
                       time_tokens: jnp.ndarray = None) -> Dict:
    """Step-invariant pieces of every MD layer for the T=1 fast path.

    Each `_md_layer` consumes the SAME (projected) condition tokens `xf` at
    every diffusion step: the sa_block k/v projections of the xf rows and the
    whole ca_block key-softmax/value of xf depend only on `xf`, so the fused
    sampler hoists them out of the 50-step loop (one compute per window
    instead of one per step).

    When `time_tokens` (num_steps, D) is given — the MLP-embedded time token
    of every DDIM step, identical across the batch — the per-layer
    projections of the time token (sa k/v, both stylization emb_linears) are
    likewise precomputed for all steps in a few (num_steps, D) matmuls,
    removing them from the loop entirely."""
    inv = {}
    n_block = (num_layers - 1) // 2
    names = ([f"input_{i}" for i in range(n_block)] + ["middle"]
             + [f"output_{i}" for i in range(n_block)])
    for name in names:
        layer = p_enc[name]
        sa = layer["sa_block"]["self_attn"]
        ca = layer["ca_block"]
        xfn = _layer_norm(xf, ca["text_norm"]["scale"], ca["text_norm"]["bias"])
        d = {
            "k_xf": _dense(sa["k_proj"], xf),
            "v_xf": _dense(sa["v_proj"], xf),
            "ca_key": jax.nn.softmax(_dense(ca["key"], xfn), axis=1),
            "ca_value": _dense(ca["value"], xfn),
        }
        # Pre-fused q|k|v (`_fuse_qkv_md`): the T=1 layer then runs ONE
        # (B, D)x(D, 3D) matmul per step instead of three (B, D)x(D, D) —
        # identical math, fewer small-matmul issues. Only consumed when the
        # caller fused XLA-side: Mosaic cannot build the concat in-kernel
        # (lane offsets past the first tile), and the fallback three-matmul
        # path stays available for the measured A/B (SEEME_QKV_FUSE=0).
        if "qkv_proj" in sa:
            d["qkv_w"] = sa["qkv_proj"]["kernel"]
            d["qkv_b"] = sa["qkv_proj"]["bias"]      # (1, 3D)
        if time_tokens is not None:
            se = jax.nn.silu(time_tokens)
            d["k_emb"] = _dense(sa["k_proj"], time_tokens)            # (S, D)
            d["v_emb"] = _dense(sa["v_proj"], time_tokens)
            d["ca_eo"] = _dense(ca["proj_out"]["emb_linear"], se)     # (S, 2D)
            d["ffn_eo"] = _dense(layer["ffn"]["proj_out"]["emb_linear"], se)
        inv[name] = d
    return inv


def _stylization_eo(p, h, eo):
    """`_stylization` with the emb_linear output (R, 2D) precomputed; R is
    the batch or 1 (a step-sliced row broadcast across the batch)."""
    scale, shift = jnp.split(eo[:, None, :], 2, axis=-1)
    h = _layer_norm(h, p["norm"]["scale"], p["norm"]["bias"]) * (1 + scale) + shift
    return _dense(p["out_linear"], jax.nn.silu(h))


def _md_layer_t1(p, x, inv, emb=None):
    """`_md_layer` specialized to a single latent token (T=1), the flagship
    latent shape (`latent_dim: [1, 256]`).

    Mathematically identical to `_md_layer`, but (a) attention/FFN compute
    only the latent row — the general path pushes the xf/time rows through
    the whole sa_block and then discards them; (b) the per-sample logits are
    S per-pair row contractions instead of a block-diag-masked (B*S, B*S)
    matmul, shrinking the softmax by ~B*S/1; (c) xf projections come from
    the hoisted `inv` (see `md_step_invariants`); (d) when `inv` carries the
    step-selected time-token rows (k_e/v_e/ca_eo/ffn_eo, shape (1, D) —
    selected by the fused sampler from the all-steps precompute), they are
    used directly and broadcast across the batch instead of recomputed."""
    sa = p["sa_block"]["self_attn"]
    D = x.shape[-1]
    if "k_e" in inv:
        k_e, v_e = inv["k_e"], inv["v_e"]                 # (1, D)
        ca_eo, ffn_eo = inv["ca_eo"], inv["ffn_eo"]
    else:
        k_e = _dense(sa["k_proj"], emb)[:, 0]             # (R, D), R in {B, 1}
        v_e = _dense(sa["v_proj"], emb)[:, 0]
        se = jax.nn.silu(emb[:, 0])
        ca_eo = _dense(p["ca_block"]["proj_out"]["emb_linear"], se)
        ffn_eo = _dense(p["ffn"]["proj_out"]["emb_linear"], se)

    if "qkv_w" in inv:
        w = inv["qkv_w"]
        qkv = jnp.dot(
            x.reshape(-1, D).astype(w.dtype), w,
            preferred_element_type=jnp.float32,
        ) + inv["qkv_b"].astype(jnp.float32)
        qkv = qkv.reshape(x.shape[0], 1, 3 * D)
        q_x = jax.lax.slice_in_dim(qkv, 0, D, axis=2)
        k_x = jax.lax.slice_in_dim(qkv, D, 2 * D, axis=2)
        v_x = jax.lax.slice_in_dim(qkv, 2 * D, 3 * D, axis=2)
    else:
        q_x = _dense(sa["q_proj"], x)                     # (B, 1, D)
        k_x = _dense(sa["k_proj"], x)
        v_x = _dense(sa["v_proj"], x)
    l_x = jnp.sum(q_x * k_x, axis=-1)                     # (B, 1)
    l_f = jnp.sum(q_x * inv["k_xf"], axis=-1)             # (B, N)
    l_e = jnp.sum(q_x[:, 0] * k_e, axis=-1, keepdims=True)
    logits = jnp.concatenate([l_x, l_f, l_e], axis=1) / math.sqrt(D)
    attn = _softmax(logits, axis=-1)                      # (B, 1+N+1)
    N = inv["k_xf"].shape[1]
    # explicit slices: mixed slice+newaxis indexing lowers through gather,
    # which Mosaic TPU rejects
    a_f = jnp.expand_dims(jax.lax.slice_in_dim(attn, 1, 1 + N, axis=1), -1)
    out = (jax.lax.slice_in_dim(attn, 0, 1, axis=1) * v_x[:, 0]
           + jnp.sum(a_f * inv["v_xf"], axis=1)
           + jax.lax.slice_in_dim(attn, 1 + N, 2 + N, axis=1) * v_e)
    out = _dense(sa["out_proj"], out[:, None])

    pb = p["sa_block"]
    x = _layer_norm(x + out, pb["norm1"]["scale"], pb["norm1"]["bias"])
    h = _dense(pb["linear2"], jax.nn.relu(_dense(pb["linear1"], x)))
    x = _layer_norm(x + h, pb["norm2"]["scale"], pb["norm2"]["bias"])

    ca = p["ca_block"]
    xn = _layer_norm(x, ca["norm"]["scale"], ca["norm"]["bias"])
    query = _softmax(_dense(ca["query"], xn), axis=-1)         # (B, 1, D)
    w = jnp.sum(query * inv["ca_key"], axis=-1)                # (B, N)
    y = jnp.sum(w[..., None] * inv["ca_value"], axis=1, keepdims=True)
    x = x + _stylization_eo(ca["proj_out"], y, ca_eo)

    ffn = p["ffn"]
    h = _dense(ffn["linear2"], jax.nn.gelu(_dense(ffn["linear1"], x),
                                           approximate=True))
    return x + _stylization_eo(ffn["proj_out"], h, ffn_eo)


def _md_layer(p, x, xf, emb):
    """MdTransformerLayer (`nn/stylization.py`)."""
    T = x.shape[1]
    seq = jnp.concatenate([x, xf, emb], axis=1)
    seq = _encoder_layer(p["sa_block"], seq)
    x = seq[:, :T]
    emb_vec = emb[:, 0]

    ca = p["ca_block"]
    N = xf.shape[1]
    xn = _layer_norm(x, ca["norm"]["scale"], ca["norm"]["bias"])
    xfn = _layer_norm(xf, ca["text_norm"]["scale"], ca["text_norm"]["bias"])
    query = jax.nn.softmax(_dense(ca["query"], xn), axis=-1)
    key = jax.nn.softmax(_dense(ca["key"], xfn), axis=1)
    value = _dense(ca["value"], xfn)
    # reassociated linear attention as block-masked MXU matmuls:
    # y[b,t] = sum_n <query[b,t], key[b,n]> value[b,n]; cross-sample terms
    # are zeroed by the block mask (multiplicative — the weights are NOT
    # softmax-normalized in linear attention).
    B = x.shape[0]
    D = x.shape[-1]
    q2 = query.reshape(B * T, D)
    k2 = key.reshape(B * N, D)
    v2 = value.reshape(B * N, D)
    w = jnp.dot(q2, k2.T, preferred_element_type=jnp.float32)  # (B*T, B*N)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (B * T, B * N), 0) // T
    colb = jax.lax.broadcasted_iota(jnp.int32, (B * T, B * N), 1) // N
    w = jnp.where(rowb == colb, w, 0.0)
    y = jnp.dot(w.astype(v2.dtype), v2, preferred_element_type=jnp.float32)
    y = y.reshape(B, T, D)
    x = x + _stylization(ca["proj_out"], y, emb_vec)

    ffn = p["ffn"]
    h = _dense(ffn["linear2"], jax.nn.gelu(_dense(ffn["linear1"], x), approximate=True))
    return x + _stylization(ffn["proj_out"], h, emb_vec)


def timestep_freqs(dim: int) -> np.ndarray:
    half = dim // 2
    return np.exp(-math.log(10000.0) * np.arange(half, dtype=np.float32) / half)


def _timestep_embedding(t, dim, flip_sin_to_cos=True, freqs=None):
    if freqs is None:
        # precomputed host-side: Mosaic rejects float iota / captured consts
        freqs = jnp.asarray(timestep_freqs(dim))
    f = freqs.reshape(-1)
    half = f.shape[0]  # sinusoid count comes from the freqs array itself
    emb = t.astype(jnp.float32)[:, None] * f[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


def denoiser_apply_pure(params: Dict, x: jnp.ndarray, timesteps: jnp.ndarray,
                        cond: jnp.ndarray, num_layers: int = 5,
                        freqs=None, md_trans: bool = True,
                        text_freq_dim: int = None,
                        md_invariants: Dict = None,
                        cond_projected: bool = False,
                        key_mask_add: jnp.ndarray = None,
                        time_token: jnp.ndarray = None) -> jnp.ndarray:
    """Pure-jnp twin of `models/denoiser.Denoiser.apply` (both block types).

    params: the flax param dict of `models/denoiser.Denoiser`.
    x (B, n_tok, D), timesteps (B,), cond (B, n_cond, text_encoded_dim).
    md_trans=True: MD stylization blocks over the latent tokens with (xf, emb)
    conditioning; md_trans=False: plain post-norm blocks over the token
    concatenation [x; time; cond] keeping the first n_tok outputs
    (`mld_denoiser.py:193-222`). When text_encoded_dim != D the condition is
    projected by relu->emb_proj first.

    key_mask_add (B, n_tok+1+n_cond) f32 additive key mask for the plain
    (md_trans=False) token-concat path — the fixed-length padded
    clip_hidden/bert tokens excluded as keys. time_token (B, 1, D) overrides
    the in-graph timestep MLP with a precomputed embedded time token (the
    fused token kernel precomputes all steps' tokens outside the loop).
    """
    p = params["params"]
    D = x.shape[-1]
    n_tok = x.shape[1]
    fast_md = md_trans and n_tok == 1
    if time_token is not None:
        time_emb = time_token
    elif fast_md and md_invariants is not None and "k_e" in next(
            iter(md_invariants.values())):
        time_emb = None  # all steps' time tokens precomputed in md_invariants
    else:
        freq_dim = text_freq_dim or cond.shape[-1] if "emb_proj_dense" in p else D
        t_emb = _timestep_embedding(timesteps, freq_dim, freqs=freqs)
        te = p["time_embedding"]
        h = _dense(te["linear_1"], t_emb)
        time_emb = _dense(te["linear_2"], jax.nn.silu(h))[:, None, :]

    if "emb_proj_dense" in p and not cond_projected:
        cond = _dense(p["emb_proj_dense"], jax.nn.relu(cond))

    enc = p["encoder"]
    n_block = (num_layers - 1) // 2

    if md_trans:
        pe = jax.lax.slice(p["query_pos"]["pe"], (0, 0), (n_tok, D))
        h = x + pe[None].astype(x.dtype)
        if n_tok == 1:
            # T=1 fast path with hoisted step-invariant cond projections
            inv = md_invariants
            if inv is None:
                inv = md_step_invariants(enc, cond, num_layers)
            skips = []
            for i in range(n_block):
                h = _md_layer_t1(enc[f"input_{i}"], h, inv[f"input_{i}"],
                                 emb=time_emb)
                skips.append(h)
            h = _md_layer_t1(enc["middle"], h, inv["middle"], emb=time_emb)
            for i in range(n_block):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = _dense(enc[f"skip_linear_{i}"], h)
                h = _md_layer_t1(enc[f"output_{i}"], h, inv[f"output_{i}"],
                                 emb=time_emb)
            return _layer_norm(h, enc["norm"]["scale"], enc["norm"]["bias"])
        skips = []
        for i in range(n_block):
            h = _md_layer(enc[f"input_{i}"], h, cond, time_emb)
            skips.append(h)
        h = _md_layer(enc["middle"], h, cond, time_emb)
        for i in range(n_block):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = _dense(enc[f"skip_linear_{i}"], h)
            h = _md_layer(enc[f"output_{i}"], h, cond, time_emb)
        return _layer_norm(h, enc["norm"]["scale"], enc["norm"]["bias"])

    xseq = jnp.concatenate([x, time_emb, cond], axis=1)
    pe = jax.lax.slice(p["query_pos"]["pe"], (0, 0), (xseq.shape[1], D))
    h = xseq + pe[None].astype(xseq.dtype)
    skips = []
    for i in range(n_block):
        h = _encoder_layer(enc[f"input_{i}"], h, activation="gelu",
                           key_mask_add=key_mask_add)
        skips.append(h)
    h = _encoder_layer(enc["middle"], h, activation="gelu",
                       key_mask_add=key_mask_add)
    for i in range(n_block):
        h = jnp.concatenate([h, skips.pop()], axis=-1)
        h = _dense(enc[f"skip_linear_{i}"], h)
        h = _encoder_layer(enc[f"output_{i}"], h, activation="gelu",
                           key_mask_add=key_mask_add)
    h = _layer_norm(h, enc["norm"]["scale"], enc["norm"]["bias"])
    return h[:, :n_tok]


# ------------------------------------------------------------- fused sampling

def _fuse_qkv(params: Dict) -> Dict:
    """Param-tree copy with every plain encoder layer's q/k/v projections
    concatenated into one `qkv_proj` (originals dropped): the fused kernels
    then run one (M, D)x(D, 3D) matmul per layer per step instead of three
    (M, D)x(D, D) — same math, a third of the small-matmul fill/setup
    stalls. Only used for the md_trans=False (token-concat) kernels; the
    T=1 MD path gets the same fusion via `md_step_invariants` qkv_w."""
    p = dict(params)
    pp = dict(p["params"])
    enc = dict(pp["encoder"])
    for name, layer in list(enc.items()):
        if not isinstance(layer, dict) or "self_attn" not in layer:
            continue
        sa = dict(layer["self_attn"])
        if not {"q_proj", "k_proj", "v_proj"} <= sa.keys():
            continue
        sa["qkv_proj"] = {
            "kernel": jnp.concatenate(
                [sa["q_proj"]["kernel"], sa["k_proj"]["kernel"],
                 sa["v_proj"]["kernel"]], axis=1),
            "bias": jnp.concatenate(
                [sa["q_proj"]["bias"], sa["k_proj"]["bias"],
                 sa["v_proj"]["bias"]]),
        }
        for k in ("q_proj", "k_proj", "v_proj"):
            del sa[k]
        enc[name] = dict(layer, self_attn=sa)
    pp["encoder"] = enc
    p["params"] = pp
    return p


def _fuse_qkv_md(params: Dict) -> Dict:
    """Like `_fuse_qkv` but for MD stylization layers (sa_block.self_attn),
    ADDING `qkv_proj` while keeping k/v: the in-kernel
    `md_step_invariants` still projects the xf/time tokens with the
    separate k/v kernels, and Mosaic cannot build the concat in-kernel
    (lane offsets past the first tile), so it ships pre-fused from XLA.
    `q_proj` has no remaining reader once `qkv_proj` exists (the T=1 layer
    takes the fused branch), so it is dropped — otherwise every fused
    window ships num_layers dead DxD bf16 matrices into the VMEM-resident
    leaf set."""
    p = dict(params)
    pp = dict(p["params"])
    enc = dict(pp["encoder"])
    for name, layer in list(enc.items()):
        if not isinstance(layer, dict) or "sa_block" not in layer:
            continue
        sa = dict(layer["sa_block"]["self_attn"])
        sa["qkv_proj"] = {
            "kernel": jnp.concatenate(
                [sa["q_proj"]["kernel"], sa["k_proj"]["kernel"],
                 sa["v_proj"]["kernel"]], axis=1),
            "bias": jnp.concatenate(
                [sa["q_proj"]["bias"], sa["k_proj"]["bias"],
                 sa["v_proj"]["bias"]])[None],
        }
        del sa["q_proj"]
        enc[name] = dict(layer, sa_block=dict(
            layer["sa_block"], self_attn=sa))
    pp["encoder"] = enc
    p["params"] = pp
    return p


def _fused_kernel_factory(treedef, num_steps, num_layers, guidance_scale,
                          md_trans=True, unroll=False):
    do_cfg = guidance_scale > 1.0

    def kernel(ts_ref, acp_ref, acp_prev_ref, z_ref, cond_ref, freqs_ref,
               ts_vec_ref, *param_refs, out_ref):
        leaves = [r[...] for r in param_refs]  # bf16-resident weights
        params = jax.tree.unflatten(treedef, leaves)
        cond = cond_ref[...].astype(jnp.float32)  # (2B, N, D) when CFG
        z = z_ref[...].astype(jnp.float32)
        B = z.shape[0]

        # hoist everything step-invariant out of the reverse loop: the cond
        # projection, the per-layer xf projections (T=1 md path), and — since
        # t is identical across the batch — the WHOLE time-token pipeline
        # (sinusoid, MLP, per-layer k/v + stylization emb_linears) for all
        # num_steps steps at once, as a few (num_steps, D) matmuls
        p = params["params"]
        if "emb_proj_dense" in p:
            cond = _dense(p["emb_proj_dense"], jax.nn.relu(cond))
            cond_projected = True
        else:
            cond_projected = False
        fast_md = md_trans and z.shape[1] == 1
        md_inv = None
        if fast_md:
            t_emb_all = _timestep_embedding(
                ts_vec_ref[...].reshape(-1), None, freqs=freqs_ref[...]
            )  # (num_steps, 2*half)
            te = p["time_embedding"]
            time_tokens = _dense(
                te["linear_2"], jax.nn.silu(_dense(te["linear_1"], t_emb_all))
            )  # (num_steps, D)
            md_inv = md_step_invariants(
                p["encoder"], cond, num_layers, time_tokens=time_tokens
            )

        def body(i, z):
            t = ts_ref[0, i]
            inv_i = md_inv
            if fast_md:
                # select this step's time-token rows from the all-steps
                # precompute: a static slice when the loop is unrolled
                # (Python int i); otherwise a one-hot matmul — Mosaic has no
                # dynamic_slice on values
                if isinstance(i, int):
                    sel = lambda a: jax.lax.slice_in_dim(a, i, i + 1, axis=0)
                else:
                    onehot = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, num_steps), 1)
                        == i
                    ).astype(jnp.float32)
                    sel = lambda a: jnp.dot(
                        onehot, a, preferred_element_type=jnp.float32)
                inv_i = {
                    name: dict(d, k_e=sel(d["k_emb"]), v_e=sel(d["v_emb"]),
                               ca_eo=sel(d["ca_eo"]), ffn_eo=sel(d["ffn_eo"]))
                    for name, d in md_inv.items()
                }
            if do_cfg:
                # [uncond; cond] halves in one doubled batch (`mld.py:467-492`)
                z_in = jnp.concatenate([z, z], axis=0)
                pred = denoiser_apply_pure(
                    params, z_in, jnp.full((2 * B,), t), cond, num_layers,
                    freqs=freqs_ref[...], md_trans=md_trans,
                    md_invariants=inv_i, cond_projected=cond_projected,
                )
                uncond, cond_pred = pred[:B], pred[B:]
                eps = uncond + guidance_scale * (cond_pred - uncond)
            else:
                eps = denoiser_apply_pure(
                    params, z, jnp.full((B,), t), cond, num_layers,
                    freqs=freqs_ref[...], md_trans=md_trans,
                    md_invariants=inv_i, cond_projected=cond_projected,
                )
            acp_t = acp_ref[0, i]
            acp_prev = acp_prev_ref[0, i]
            x0 = (z - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)
            return jnp.sqrt(acp_prev) * x0 + jnp.sqrt(1.0 - acp_prev) * eps

        if unroll:
            for i in range(num_steps):
                z = body(i, z)
        else:
            z = jax.lax.fori_loop(0, num_steps, body, z)
        out_ref[...] = z.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "num_layers", "guidance_scale", "md_trans",
                     "unroll", "interpret"),
)
def ddim_fused(
    denoiser_params: Dict,
    cond: jnp.ndarray,          # (B, n_cond, D)
    z0: jnp.ndarray,            # (B, n_tok, D) initial noise (already scaled)
    timesteps: jnp.ndarray,     # (num_steps,) int32, descending
    acp_t: jnp.ndarray,         # (num_steps,) alphas_cumprod[t]
    acp_prev: jnp.ndarray,      # (num_steps,) alphas_cumprod at prev step
    num_steps: int = 50,
    num_layers: int = 5,
    guidance_scale: float = 1.0,
    md_trans: bool = True,
    # fully unroll the reverse loop (static step indices, no one-hot
    # selections). Mathematically identical; measured compile time through
    # the axon remote-compile tunnel exceeds 20 min for 50 steps, so the
    # rolled fori_loop stays the default.
    unroll: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole DDIM reverse process (epsilon prediction, eta=0) in one kernel.

    Weights are passed bf16 and upcast once into VMEM-resident f32 values;
    the per-step math matches `DiffusionSchedule.ddim_step` with
    clip_sample=False.
    """
    # q|k|v pre-fused XLA-side, once per window (Mosaic cannot concat
    # weight tiles in-kernel)
    if QKV_FUSE:
        denoiser_params = (_fuse_qkv_md(denoiser_params) if md_trans
                           else _fuse_qkv(denoiser_params))
    leaves, treedef = jax.tree.flatten(denoiser_params)
    leaves_bf16 = [l.astype(jnp.bfloat16) for l in leaves]

    # sinusoid dim = text_encoded_dim when the condition projection exists
    dp = denoiser_params["params"]
    freq_dim = (
        dp["emb_proj_dense"]["kernel"].shape[0]
        if "emb_proj_dense" in dp
        else z0.shape[-1]
    )
    kernel = _fused_kernel_factory(
        treedef, num_steps, num_layers, guidance_scale, md_trans,
        unroll=unroll,
    )

    def kernel_entry(*refs):
        ts_ref, acp_ref, acp_prev_ref, z_ref, cond_ref, freqs_ref, ts_vec_ref = refs[:7]
        param_refs = refs[7:-1]
        out_ref = refs[-1]
        kernel(ts_ref, acp_ref, acp_prev_ref, z_ref, cond_ref, freqs_ref,
               ts_vec_ref, *param_refs, out_ref=out_ref)

    # schedule scalars live in SMEM (dynamic scalar indexing), tensors in VMEM
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (4 + len(leaves_bf16))
    )
    return pl.pallas_call(
        kernel_entry,
        out_shape=jax.ShapeDtypeStruct(z0.shape, z0.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # weights ~13 MB bf16 + activations; raise the scoped-vmem cap above
        # the 16 MB default (v5e has 128 MB physical VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        timesteps.reshape(1, -1).astype(jnp.int32),
        acp_t.reshape(1, -1).astype(jnp.float32),
        acp_prev.reshape(1, -1).astype(jnp.float32),
        z0, cond,
        jnp.asarray(timestep_freqs(freq_dim)).reshape(1, -1),
        timesteps.reshape(1, -1).astype(jnp.float32),  # f32 copy for the
        # all-steps time-token precompute (SMEM ints can't feed vector math)
        *leaves_bf16,
    )


def _grid_kernel_factory(treedef, inv_treedef, step_treedef, num_steps,
                         num_layers, guidance_scale, n_inv, n_step):
    do_cfg = guidance_scale > 1.0

    def kernel(*refs):
        acp_ref, acp_prev_ref, z0_ref = refs[:3]
        inv_refs = refs[3:3 + n_inv]
        step_refs = refs[3 + n_inv:3 + n_inv + n_step]
        param_refs = refs[3 + n_inv + n_step:-1]
        out_ref = refs[-1]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            out_ref[...] = z0_ref[...]

        params = jax.tree.unflatten(treedef, [r[...] for r in param_refs])
        inv_static = jax.tree.unflatten(inv_treedef, [r[...] for r in inv_refs])
        # blocked per-step rows: BlockSpec already delivered THIS step's
        # (1, 1, dim) slice (leading singleton satisfies Mosaic's block
        # layout rule) — no one-hot selection, no dynamic indexing
        step_rows = jax.tree.unflatten(
            step_treedef, [r[...][0] for r in step_refs])
        inv = {
            name: dict(inv_static[name],
                       k_e=step_rows[name]["k_emb"],
                       v_e=step_rows[name]["v_emb"],
                       ca_eo=step_rows[name]["ca_eo"],
                       ffn_eo=step_rows[name]["ffn_eo"])
            for name in inv_static
        }

        z = out_ref[...].astype(jnp.float32)
        B = z.shape[0]
        if do_cfg:
            z_in = jnp.concatenate([z, z], axis=0)
            pred = denoiser_apply_pure(
                params, z_in, None, None, num_layers,
                md_invariants=inv, cond_projected=True,
            )
            uncond, cond_pred = pred[:B], pred[B:]
            eps = uncond + guidance_scale * (cond_pred - uncond)
        else:
            eps = denoiser_apply_pure(
                params, z, None, None, num_layers,
                md_invariants=inv, cond_projected=True,
            )
        acp_t = acp_ref[0, i]
        acp_prev = acp_prev_ref[0, i]
        x0 = (z - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)
        out_ref[...] = (jnp.sqrt(acp_prev) * x0
                        + jnp.sqrt(1.0 - acp_prev) * eps).astype(out_ref.dtype)

    return kernel


def _window_precompute(dp, cond, latent_dim, timesteps):
    """XLA-side f32 per-window precompute shared by the grid and token
    kernels: the emb_proj condition projection (sinusoid dim follows the
    projection's input width, `mld_denoiser.py:97-104`) and the time-token
    MLP evaluated for ALL steps up front. Kept in one place so the two
    fused variants cannot drift numerically."""
    cond_p = cond
    if "emb_proj_dense" in dp:
        cond_p = _dense(dp["emb_proj_dense"], jax.nn.relu(cond))
        freq_dim = dp["emb_proj_dense"]["kernel"].shape[0]
    else:
        freq_dim = latent_dim
    t_emb_all = _timestep_embedding(
        timesteps.astype(jnp.float32), None,
        freqs=jnp.asarray(timestep_freqs(freq_dim)),
    )
    te = dp["time_embedding"]
    time_tokens = _dense(
        te["linear_2"], jax.nn.silu(_dense(te["linear_1"], t_emb_all)))
    return cond_p, time_tokens


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "num_layers", "guidance_scale", "interpret"),
)
def ddim_fused_grid(
    denoiser_params: Dict,
    cond: jnp.ndarray,          # (B or 2B, n_cond, text_dim)
    z0: jnp.ndarray,            # (B, 1, D)
    timesteps: jnp.ndarray,
    acp_t: jnp.ndarray,
    acp_prev: jnp.ndarray,
    num_steps: int = 50,
    num_layers: int = 5,
    guidance_scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """`ddim_fused` restructured as a Pallas grid over the diffusion steps —
    the idiomatic Mosaic shape for a fixed-trip sequential loop (T=1 MD path
    only; `ddim_fused` remains the general entry).

    Differences vs the fori_loop kernel, all latency wins at identical math:
      * every step-dependent quantity (time-token MLP and its per-layer
        k/v + stylization emb_linear projections) is precomputed for ALL
        steps OUTSIDE the kernel in plain XLA (f32, ~25 tiny matmuls per
        window) and streamed in as (1, dim) blocks by the grid's BlockSpec —
        the fori_loop kernel re-selected them per step with 20 one-hot
        (1, num_steps) matmuls (M=1 MXU streams, ~38% of the measured step
        in the ceil-tile model, scripts/DDIM_ROOFLINE.json);
      * the condition projection and per-layer xf invariants likewise move
        to XLA (f32 instead of bf16 weights: strictly closer to the scan);
      * z carries across grid iterations in the revisited output block
        (Mosaic keeps unchanged-index blocks VMEM-resident; weights are
        fetched once).

    The grid executes sequentially on the TensorCore, preserving the
    step-order dependency by construction.
    """
    assert z0.shape[1] == 1, "grid kernel is specialized to the T=1 path"
    dp = denoiser_params["params"]

    # ---- XLA-side per-window precompute (f32)
    cond_p, time_tokens = _window_precompute(dp, cond, z0.shape[-1], timesteps)
    if QKV_FUSE:
        dp = _fuse_qkv_md(denoiser_params)["params"]
    full_inv = md_step_invariants(dp["encoder"], cond_p, num_layers,
                                  time_tokens=time_tokens)
    static_keys = ("k_xf", "v_xf", "ca_key", "ca_value") + (
        ("qkv_w", "qkv_b") if QKV_FUSE else ())
    inv_static = {n: {k: d[k] for k in static_keys}
                  for n, d in full_inv.items()}
    step_rows = {n: {k: d[k] for k in ("k_emb", "v_emb", "ca_eo", "ffn_eo")}
                 for n, d in full_inv.items()}

    inv_leaves, inv_treedef = jax.tree.flatten(inv_static)
    step_leaves, step_treedef = jax.tree.flatten(step_rows)
    leaves, treedef = jax.tree.flatten(denoiser_params)
    leaves_bf16 = [l.astype(jnp.bfloat16) for l in leaves]

    kernel = _grid_kernel_factory(
        treedef, inv_treedef, step_treedef, num_steps, num_layers,
        guidance_scale, len(inv_leaves), len(step_leaves),
    )

    whole = lambda *shape: pl.BlockSpec(  # noqa: E731 — same block every step
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2            # acp, acp_prev
        + [whole(*z0.shape)]
        + [whole(*l.shape) for l in inv_leaves]
        # step rows ship as (num_steps, 1, dim) with block (1, 1, dim): a
        # bare (1, dim) block over (num_steps, dim) fails Mosaic lowering
        # (second-to-last block dim 1 neither 8-divisible nor == num_steps)
        + [pl.BlockSpec((1, 1, l.shape[1]), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM) for l in step_leaves]
        + [whole(*l.shape) for l in leaves_bf16]
    )
    return pl.pallas_call(
        kernel,
        grid=(num_steps,),
        out_shape=jax.ShapeDtypeStruct(z0.shape, z0.dtype),
        in_specs=in_specs,
        out_specs=whole(*z0.shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        acp_t.reshape(1, -1).astype(jnp.float32),
        acp_prev.reshape(1, -1).astype(jnp.float32),
        z0,
        *inv_leaves,
        *[l[:, None, :] for l in step_leaves],
        *leaves_bf16,
    )


def ddim_schedule_arrays(schedule, num_steps: int):
    """Precompute (timesteps, acp_t, acp_prev) for the fused kernel."""
    ts = schedule.ddim_timesteps(num_steps)
    # host-side copy — a d2h fetch of the device twin can fail transiently
    # through the axon relay (schedulers.py::alphas_cumprod_np)
    acp = schedule.alphas_cumprod_np
    prev_t = ts - schedule.num_train_timesteps // num_steps
    final = 1.0 if schedule.set_alpha_to_one else acp[0]
    acp_prev = np.where(prev_t >= 0, acp[np.maximum(prev_t, 0)], final)
    return (
        jnp.asarray(ts, jnp.int32),
        jnp.asarray(acp[ts], jnp.float32),
        jnp.asarray(acp_prev, jnp.float32),
    )


def fused_ddim_flops(
    denoiser_params: Dict,
    batch: int,
    n_cond: int,
    num_steps: int = 50,
    num_layers: int = 5,
    guidance_scale: float = 1.0,
    n_tok: int = 1,
) -> float:
    """Analytic FLOP count of one `ddim_fused` call (T=1 MD path).

    XLA's cost analysis cannot see inside the Pallas custom call, so the
    kernel's flops — the bulk of the sampling window's arithmetic — are
    computed here in closed form from the actual weight shapes: 2*m*n per
    (m, n) dense row, plus the attention dot-products. Mirrors the kernel
    structure exactly: step-invariant cond/time projections counted once per
    window (`md_step_invariants`), the per-step latent-row work counted
    num_steps times (`_md_layer_t1`). bench.py adds this to the XLA-visible
    flops for the true-MFU figure (VERDICT r2 weak #2)."""
    p = denoiser_params["params"]

    def wf(dense):  # flops per row through a dense (in, out) kernel
        k = dense["kernel"]
        return 2.0 * float(k.shape[0]) * float(k.shape[1])

    B = batch * (2 if guidance_scale > 1.0 else 1)
    total = 0.0
    if "emb_proj_dense" in p:
        total += B * n_cond * wf(p["emb_proj_dense"])
    te = p["time_embedding"]
    total += num_steps * (wf(te["linear_1"]) + wf(te["linear_2"]))

    enc = p["encoder"]
    D = float(enc["norm"]["scale"].shape[0])
    n_block = (num_layers - 1) // 2
    names = ([f"input_{i}" for i in range(n_block)] + ["middle"]
             + [f"output_{i}" for i in range(n_block)])
    for name in names:
        L = enc[name]
        sa = L["sa_block"]["self_attn"]
        ca = L["ca_block"]
        # hoisted invariants: xf projections once per window, time-token
        # projections once per step-row
        total += B * n_cond * (wf(sa["k_proj"]) + wf(sa["v_proj"])
                               + wf(ca["key"]) + wf(ca["value"]))
        total += num_steps * (wf(sa["k_proj"]) + wf(sa["v_proj"])
                              + wf(ca["proj_out"]["emb_linear"])
                              + wf(L["ffn"]["proj_out"]["emb_linear"]))
        # per-step latent-row work
        step = wf(sa["q_proj"]) + wf(sa["k_proj"]) + wf(sa["v_proj"])
        step += 2.0 * D * (n_cond + 2)          # attention logits
        step += 2.0 * D * (n_cond + 2)          # attention value mix
        step += wf(sa["out_proj"])
        step += wf(L["sa_block"]["linear1"]) + wf(L["sa_block"]["linear2"])
        step += wf(ca["query"]) + 2.0 * 2.0 * D * n_cond   # ca w + y
        step += wf(ca["proj_out"]["out_linear"])
        step += wf(L["ffn"]["linear1"]) + wf(L["ffn"]["linear2"])
        step += wf(L["ffn"]["proj_out"]["out_linear"])
        total += num_steps * B * n_tok * step
    for i in range(n_block):
        total += num_steps * B * n_tok * wf(enc[f"skip_linear_{i}"])
    return total
