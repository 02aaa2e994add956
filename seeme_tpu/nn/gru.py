"""Bidirectional GRU encoders for the T2M evaluators.

Reimplements `mld/models/architectures/t2m_textenc.py` and
`t2m_motionenc.py` (TextEncoderBiGRUCo / MovementConvEncoder /
MotionEncoderBiGRUCo): the frozen pretrained embedders behind the TM2T
metrics (FID / R-precision). torch's pack_padded_sequence semantics —
"the GRU stops at each sequence's length" — become masked scan updates:
the cell state only advances on valid frames, so the forward final state
equals the state at t = len-1 and the backward pass consumes only the
valid range. Weight layout matches torch GRU gate order (r, z, n) for
mechanical checkpoint conversion.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class GruCell(nn.Module):
    """torch.nn.GRU cell: gates ordered (reset, update, new)."""

    hidden_size: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden_size
        gi = nn.Dense(3 * H, name="weight_ih")(x)
        gh = nn.Dense(3 * H, name="weight_hh")(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1 - z) * n + z * h


class _MaskedGruScan(nn.Module):
    """GRU cell scanned over the (time-major) sequence; state only advances
    on valid frames."""

    hidden_size: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, inp):
        x_t, valid = inp
        h_new = GruCell(self.hidden_size, name="cell")(h, x_t)
        h = jnp.where(valid[:, None], h_new, h)
        return h, None


class BiGru(nn.Module):
    """Single-layer bidirectional GRU returning the concatenated final
    hidden states (2H), honoring per-sequence lengths."""

    hidden_size: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                      # (B, T, D)
        lengths: Optional[jnp.ndarray],      # (B,)
        h0: jnp.ndarray,                     # (2, B, H) initial hidden
    ) -> jnp.ndarray:
        B, T, _ = x.shape
        if lengths is None:
            lengths = jnp.full((B,), T)
        valid = jnp.arange(T)[None, :] < lengths[:, None]  # (B, T)
        xs_t = jnp.moveaxis(x, 1, 0)
        valid_t = jnp.moveaxis(valid, 1, 0)

        Scan = nn.scan(
            _MaskedGruScan,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        h_fwd, _ = Scan(self.hidden_size, name="fwd")(h0[0], (xs_t, valid_t))
        h_bwd, _ = Scan(self.hidden_size, name="bwd")(
            h0[1], (xs_t[::-1], valid_t[::-1])
        )
        return jnp.concatenate([h_fwd, h_bwd], axis=-1)    # (B, 2H)


class TextEncoderBiGRUCo(nn.Module):
    """`t2m_textenc.py:6-48`: word + positional-POS embeddings -> BiGRU ->
    MLP head with LayerNorm + LeakyReLU(0.2)."""

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        inputs = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        hidden = self.param(
            "hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size)
        )
        h0 = jnp.broadcast_to(hidden, (2, inputs.shape[0], self.hidden_size))
        h = BiGru(self.hidden_size, name="gru")(inputs, cap_lens, h0)
        h = nn.Dense(self.hidden_size, name="out_0")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="out_ln")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="out_1")(h)


class MovementConvEncoder(nn.Module):
    """`t2m_motionenc.py:6-25`: two stride-2 1-D convs (k=4) + linear."""

    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:  # (B, T, D)
        h = nn.Conv(self.hidden_size, (4,), strides=(2,), padding=1, name="conv1")(inputs)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.output_size, (4,), strides=(2,), padding=1, name="conv2")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="out_net")(h)


class MotionEncoderBiGRUCo(nn.Module):
    """`t2m_motionenc.py:28-62`."""

    input_size: int = 512
    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs, m_lens):
        x = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        hidden = self.param(
            "hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size)
        )
        h0 = jnp.broadcast_to(hidden, (2, x.shape[0], self.hidden_size))
        h = BiGru(self.hidden_size, name="gru")(x, m_lens, h0)
        h = nn.Dense(self.hidden_size, name="out_0")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="out_ln")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="out_1")(h)
