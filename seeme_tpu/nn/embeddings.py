"""Positional and timestep embeddings.

Reimplements the reference's embedding zoo (`mld/models/architectures/tools/
embeddings.py:260-322`, `mld/models/operator/position_encoding.py:113-186`)
batch-first in flax. Only the members actually used by the shipped configs are
kept: diffusers-style sinusoidal timestep embeddings + MLP, and the
learned/sine 1-D positional encodings selected by ``position_embedding:
'learned'`` in `configs/modules/motion_vae.yaml` / `denoiser.yaml`.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """(B,) timesteps -> (B, dim). Bit-matches diffusers `get_timestep_embedding`
    (reference copy at `tools/embeddings.py:260-285`)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Linear -> SiLU -> Linear MLP over the sinusoidal embedding
    (`tools/embeddings.py:288-305`)."""

    time_embed_dim: int

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(self.time_embed_dim, name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, name="linear_2")(sample)
        return sample


class LearnedPositionalEncoding(nn.Module):
    """Additive learned PE, `PositionEmbeddingLearned1D`
    (`position_encoding.py:138-159`): parameter (max_len, d) initialized
    U[0, 1) (the reference's `nn.init.uniform_` default), added to the input.
    """

    d_model: int
    max_len: int = 500

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, D)
        pe = self.param(
            "pe", nn.initializers.uniform(scale=1.0), (self.max_len, self.d_model)
        )
        return x + pe[None, : x.shape[1], :]


class SinusoidalPositionalEncoding(nn.Module):
    """Non-learned sine PE (`PositionEmbeddingSine1D`, returns PE only in the
    reference; here additive for a uniform interface)."""

    d_model: int
    max_len: int = 500

    def setup(self):
        position = jnp.arange(self.max_len, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(
            jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
            * (-math.log(10000.0) / self.d_model)
        )
        pe = jnp.zeros((self.max_len, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
        self.pe = pe

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x + self.pe[None, : x.shape[1], :]


def build_position_encoding(d_model: int, position_embedding: str = "learned") -> nn.Module:
    """Factory mirroring `position_encoding.py:163-186` (1-D variants)."""
    if position_embedding in ("v2", "sine"):
        return SinusoidalPositionalEncoding(d_model)
    if position_embedding in ("v3", "learned"):
        return LearnedPositionalEncoding(d_model)
    raise ValueError(f"not supported {position_embedding}")
