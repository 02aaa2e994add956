"""Pretrained action-recognition evaluators for the action-to-motion branch.

The reference evaluates HumanAct12 with a GRU recognition model taken from
action2motion (`mld/models/architectures/humanact12_gru.py:6-82`:
`MotionDiscriminator` for accuracy logits, `MotionDiscriminatorForFID`
returning the 30-d tanh(linear1) feature for FID/diversity). The torch
module runs a stacked nn.GRU over the time-major padded sequence and indexes
the output at `lengths - 1`; here one masked `nn.scan` freezes every layer's
state after the last valid frame, which selects the same step without
materializing the (T, B, H) output tensor.

Deviation by design: the reference draws the GRU's initial hidden state from
an *unseeded* `torch.randn` on every call (`humanact12_gru.py:51-55`), which
makes its reported FID/accuracy stochastic run-to-run. We use a zero initial
state — deterministic, and what nn.GRU defaults to when no hidden is passed.

Weights: convert the released `humanact12_gru.tar` evaluator with
`tools/convert_checkpoint.py --kind a2m_gru`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.masks import lengths_to_mask

__all__ = ["MotionDiscriminator"]


class _StackedGruStep(nn.Module):
    """One time step of an L-layer GRU stack; state frozen on padded frames."""

    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, hs: Tuple[jnp.ndarray, ...], inp):
        from ..nn.gru import GruCell

        x_t, valid = inp
        new_hs = []
        h_in = x_t
        for layer, h in enumerate(hs):
            h_new = GruCell(self.hidden_size, name=f"cell_{layer}")(h, h_in)
            h = jnp.where(valid[:, None], h_new, h)
            new_hs.append(h)
            h_in = h
        return tuple(new_hs), None


class MotionDiscriminator(nn.Module):
    """a2m GRU action classifier (`humanact12_gru.py:6-82`).

    __call__(motion (B, T, D), lengths (B,)) -> (logits (B, C), feats (B, 30))
    where feats = tanh(linear1(gru_out[length-1])) is the FID embedding and
    logits = linear2(feats) the recognition scores. D = njoints * nfeats of
    the dataset's joint-position layout (72 for humanact12's 24 x xyz).
    """

    hidden_size: int = 128
    num_layers: int = 2
    output_size: int = 12

    @nn.compact
    def __call__(
        self, motion: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, _ = motion.shape
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        valid = lengths_to_mask(lengths, T)  # (B, T)

        hs0 = tuple(
            jnp.zeros((B, self.hidden_size)) for _ in range(self.num_layers)
        )
        scan = nn.scan(
            _StackedGruStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self.hidden_size, self.num_layers, name="recurrent")
        hs, _ = scan(hs0, (motion.swapaxes(0, 1), valid.swapaxes(0, 1)))

        feats = jnp.tanh(nn.Dense(30, name="linear1")(hs[-1]))
        logits = nn.Dense(self.output_size, name="linear2")(feats)
        return logits, feats
