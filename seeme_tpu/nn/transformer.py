"""Transformer layer library: encoder/decoder layers and the DETR-style
U-skip stacks that both the motion VAE and the latent denoiser are built from.

Reimplements `mld/models/operator/cross_attention.py:18-433` batch-first
(B, T, D) — the reference is seq-first torch; on TPU batch-first keeps the
batch on the sharded leading axis and lets XLA batch all attention matmuls.

Semantics preserved:
  * post-norm (normalize_before=False in every shipped config) residual blocks,
  * key-padding masks (True = valid here; the reference passes ~mask with
    True = pad — callers here pass validity masks directly),
  * the U-skip topology: (L-1)/2 input blocks, 1 middle block, (L-1)/2 output
    blocks, each output block preceded by Linear(2d -> d) over the
    concatenation with the popped skip (`cross_attention.py:41-86`),
  * xavier-uniform init for all >1-D params (`cross_attention.py:36-39`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

xavier = nn.initializers.xavier_uniform()

# torch F.gelu defaults to the exact erf form; flax nn.gelu defaults to the
# tanh approximation — pin exact for checkpoint-conversion parity.
_ACT = {
    "relu": nn.relu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "glu": nn.glu,
}

NEG_INF = -1e9  # additive mask value; finite to stay NaN-free on fully-masked rows


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (separate q/k/v inputs, one out
    projection, softmax over keys with optional key-padding mask)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Tq, D)
        key: jnp.ndarray,    # (B, Tk, D)
        value: jnp.ndarray,  # (B, Tk, D)
        key_valid_mask: Optional[jnp.ndarray] = None,  # (B, Tk) True = attend
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, Tq, D = query.shape
        H = self.num_heads
        hd = D // H
        q = nn.Dense(D, kernel_init=xavier, name="q_proj")(query)
        k = nn.Dense(D, kernel_init=xavier, name="k_proj")(key)
        v = nn.Dense(D, kernel_init=xavier, name="v_proj")(value)
        q = q.reshape(B, Tq, H, hd)
        k = k.reshape(B, -1, H, hd)
        v = v.reshape(B, -1, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if key_valid_mask is not None:
            logits = logits + jnp.where(key_valid_mask, 0.0, NEG_INF)[:, None, None, :]
        attn = nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Tq, D)
        return nn.Dense(D, kernel_init=xavier, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Self-attention + FFN residual block (`cross_attention.py:258-316`)."""

    d_model: int
    num_heads: int
    ff_size: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        key_valid_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        act = _ACT[self.activation]
        attn = MultiHeadAttention(self.d_model, self.num_heads, self.dropout, name="self_attn")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        if self.normalize_before:
            h = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
            src = src + drop(attn(h, h, h, key_valid_mask, deterministic))
            h = nn.LayerNorm(epsilon=1e-5, name="norm2")(src)
            h = nn.Dense(self.d_model, kernel_init=xavier, name="linear2")(
                drop(act(nn.Dense(self.ff_size, kernel_init=xavier, name="linear1")(h)))
            )
            return src + drop(h)

        src = src + drop(attn(src, src, src, key_valid_mask, deterministic))
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        h = nn.Dense(self.d_model, kernel_init=xavier, name="linear2")(
            drop(act(nn.Dense(self.ff_size, kernel_init=xavier, name="linear1")(src)))
        )
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + drop(h))


class TransformerDecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN block (`cross_attention.py:319-403`)."""

    d_model: int
    num_heads: int
    ff_size: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_valid_mask: Optional[jnp.ndarray] = None,
        memory_valid_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        act = _ACT[self.activation]
        self_attn = MultiHeadAttention(self.d_model, self.num_heads, self.dropout, name="self_attn")
        cross_attn = MultiHeadAttention(self.d_model, self.num_heads, self.dropout, name="multihead_attn")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        if self.normalize_before:
            h = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
            tgt = tgt + drop(self_attn(h, h, h, tgt_valid_mask, deterministic))
            h = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
            tgt = tgt + drop(cross_attn(h, memory, memory, memory_valid_mask, deterministic))
            h = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
            h = nn.Dense(self.d_model, kernel_init=xavier, name="linear2")(
                drop(act(nn.Dense(self.ff_size, kernel_init=xavier, name="linear1")(h)))
            )
            return tgt + drop(h)

        tgt = tgt + drop(self_attn(tgt, tgt, tgt, tgt_valid_mask, deterministic))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        tgt = tgt + drop(cross_attn(tgt, memory, memory, memory_valid_mask, deterministic))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        h = nn.Dense(self.d_model, kernel_init=xavier, name="linear2")(
            drop(act(nn.Dense(self.ff_size, kernel_init=xavier, name="linear1")(tgt)))
        )
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + drop(h))


class TransformerDecoder(nn.Module):
    """Plain (non-skip) decoder stack with a final norm
    (`cross_attention.py:217-255`, return_intermediate=False) — the
    arch='trans_dec' denoiser path (`configs/modules_novae/denoiser.yaml`)."""

    make_layer: Callable[[str], nn.Module]
    num_layers: int
    d_model: int

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_valid_mask: Optional[jnp.ndarray] = None,
        memory_valid_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        x = tgt
        for i in range(self.num_layers):
            x = self.make_layer(f"layer_{i}")(
                x, memory, tgt_valid_mask, memory_valid_mask, deterministic
            )
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class SkipTransformerEncoder(nn.Module):
    """U-skip encoder stack (`cross_attention.py:18-86`).

    ``make_layer`` builds one block; blocks do NOT share parameters (the
    reference deep-copies the prototype layer). ``layer_kwargs`` are passed to
    every block call — this is how the MD-stylization blocks receive their
    (xf, emb) conditioning while plain blocks receive the padding mask.
    """

    make_layer: Callable[[str], nn.Module]
    num_layers: int
    d_model: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True, **layer_kwargs: Any):
        assert self.num_layers % 2 == 1
        n_block = (self.num_layers - 1) // 2

        skips = []
        for i in range(n_block):
            x = self.make_layer(f"input_{i}")(x, deterministic=deterministic, **layer_kwargs)
            skips.append(x)

        x = self.make_layer("middle")(x, deterministic=deterministic, **layer_kwargs)

        for i in range(n_block):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = nn.Dense(self.d_model, kernel_init=xavier, name=f"skip_linear_{i}")(x)
            x = self.make_layer(f"output_{i}")(x, deterministic=deterministic, **layer_kwargs)

        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class SkipTransformerDecoder(nn.Module):
    """U-skip decoder stack (`cross_attention.py:88-147`)."""

    make_layer: Callable[[str], nn.Module]
    num_layers: int
    d_model: int

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_valid_mask: Optional[jnp.ndarray] = None,
        memory_valid_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        assert self.num_layers % 2 == 1
        n_block = (self.num_layers - 1) // 2

        x = tgt
        skips = []
        for i in range(n_block):
            x = self.make_layer(f"input_{i}")(
                x, memory, tgt_valid_mask, memory_valid_mask, deterministic
            )
            skips.append(x)

        x = self.make_layer("middle")(x, memory, tgt_valid_mask, memory_valid_mask, deterministic)

        for i in range(n_block):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = nn.Dense(self.d_model, kernel_init=xavier, name=f"skip_linear_{i}")(x)
            x = self.make_layer(f"output_{i}")(
                x, memory, tgt_valid_mask, memory_valid_mask, deterministic
            )

        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)
