"""MotionDiffuse-style stylization layers used by the shipped EgoBody denoiser
(`ABLATION.MD_TRANS: True`, `configs/config_mld_egobody.yaml:49`).

Reimplements `mld/models/architectures/mdiff_transformer.py:137-304`
batch-first:
  * StylizationBlock — AdaLN-like time-conditioned gate with a zero-initialized
    output projection (`zero_module`, :128-134),
  * LinearTemporalCrossAttention — linear attention: softmax over the feature
    axis for queries, over the token axis for keys (:206-239),
  * FFN with zero-initialized second linear (:241-254),
  * MdTransformerLayer — the `LinearTemporalDiffusionTransformerDecoderLayer`
    with `use_MLD_Transformer=True` (:257-304): a standard post-norm
    self-attention block over the concatenation [x; xf; time] (ff=1024, relu —
    hard-coded at :279), then linear cross-attention, then FFN; the last two
    conditioned via stylization.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .transformer import TransformerEncoderLayer, xavier

zeros_init = nn.initializers.zeros


class StylizationBlock(nn.Module):
    """h <- zero_linear(silu(dropout(norm(h) * (1+scale) + shift)))
    where (scale, shift) = silu->linear(time_emb)."""

    latent_dim: int
    time_embed_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, h: jnp.ndarray, emb: jnp.ndarray, deterministic: bool = True):
        # h: (B, T, D); emb: (B, time_embed_dim)
        emb_out = nn.Dense(2 * self.latent_dim, kernel_init=xavier, name="emb_linear")(
            nn.silu(emb)
        )[:, None, :]
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h) * (1 + scale) + shift
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        # Zero-initialized so the block starts as identity in its residual.
        return nn.Dense(self.latent_dim, kernel_init=zeros_init, name="out_linear")(h)


class LinearTemporalCrossAttention(nn.Module):
    """O(T+N) cross attention (`mdiff_transformer.py:206-239`)."""

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.1
    time_embed_dim: int = 256

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,   # (B, T, D)
        xf: jnp.ndarray,  # (B, N, L)
        emb: jnp.ndarray,  # (B, time_embed_dim)
        deterministic: bool = True,
        xf_valid_mask: Optional[jnp.ndarray] = None,  # (B, N) True = attend
    ):
        B, T, D = x.shape
        N = xf.shape[1]
        H = self.num_heads
        xn = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        xfn = nn.LayerNorm(epsilon=1e-5, name="text_norm")(xf)
        query = nn.Dense(D, kernel_init=xavier, name="query")(xn).reshape(B, T, H, -1)
        key_logits = nn.Dense(D, kernel_init=xavier, name="key")(xfn).reshape(B, N, H, -1)
        if xf_valid_mask is not None:
            # padded condition tokens drop out of the token-axis softmax
            # (the reference pads only to the longest caption in the batch;
            # fixed-length padding here must stay inert — ADVICE r2)
            key_logits = jnp.where(
                xf_valid_mask[:, :, None, None], key_logits, -1e9)
        value = nn.Dense(D, kernel_init=xavier, name="value")(xfn).reshape(B, N, H, -1)
        query = nn.softmax(query, axis=-1)   # over head-dim features
        key = nn.softmax(key_logits, axis=1)  # over condition tokens
        attention = jnp.einsum("bnhd,bnhl->bhdl", key, value)
        y = jnp.einsum("bnhd,bhdl->bnhl", query, attention).reshape(B, T, D)
        y = x + StylizationBlock(D, self.time_embed_dim, self.dropout, name="proj_out")(
            y, emb, deterministic
        )
        return y


class StylizedFFN(nn.Module):
    """FFN with zero-init second linear + stylization residual
    (`mdiff_transformer.py:241-254`)."""

    latent_dim: int
    ffn_dim: int
    dropout: float = 0.1
    time_embed_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray, deterministic: bool = True):
        h = nn.Dense(self.ffn_dim, kernel_init=xavier, name="linear1")(x)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU() is the exact erf form
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.latent_dim, kernel_init=zeros_init, name="linear2")(h)
        return x + StylizationBlock(self.latent_dim, self.time_embed_dim, self.dropout, name="proj_out")(
            h, emb, deterministic
        )


class MdTransformerLayer(nn.Module):
    """One MD-stylization denoiser block (`mdiff_transformer.py:257-304`).

    Self-attention runs over the token concatenation [x; xf; time_emb] with a
    plain post-norm encoder layer (ff=1024, relu), keeping only the x tokens;
    then linear cross-attention over xf; then stylized FFN. The time token
    participates in self-attention AND modulates the styled blocks.
    """

    d_model: int
    num_heads: int
    ffn_dim: int = 128
    dropout: float = 0.1
    text_latent_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # (B, T, D) latent tokens
        xf: jnp.ndarray,           # (B, N, D) condition tokens
        emb: jnp.ndarray,          # (B, 1, D) time embedding token
        deterministic: bool = True,
        xf_valid_mask: Optional[jnp.ndarray] = None,  # (B, N) True = attend
    ):
        B, T = x.shape[:2]
        seq = jnp.concatenate([x, xf, emb], axis=1)
        key_valid = None
        if xf_valid_mask is not None:
            ones = jnp.ones((B, T), bool)
            key_valid = jnp.concatenate(
                [ones, xf_valid_mask, jnp.ones((B, 1), bool)], axis=1)
        seq = TransformerEncoderLayer(
            self.d_model, self.num_heads, 1024, self.dropout, "relu", False, name="sa_block"
        )(seq, key_valid_mask=key_valid, deterministic=deterministic)
        x = seq[:, :T]
        emb_vec = emb[:, 0]  # (B, D)
        x = LinearTemporalCrossAttention(
            self.d_model,
            self.text_latent_dim or self.d_model,
            self.num_heads,
            self.dropout,
            time_embed_dim=self.d_model,
            name="ca_block",
        )(x, xf, emb_vec, deterministic, xf_valid_mask=xf_valid_mask)
        x = StylizedFFN(
            self.d_model, self.ffn_dim, self.dropout, time_embed_dim=self.d_model, name="ffn"
        )(x, emb_vec, deterministic)
        return x
