"""Action-class conditioning for the HumanAct12/UESTC action-to-motion
configs.

Reimplements `mld/models/architectures/mld_denoiser.py:247-296` (EmbedAction):
a learned per-class embedding with classifier-free-guidance masking — at
train time whole samples are zeroed with prob `guidance_uncondp`; at eval
with guidance the batch is [uncond (forced zero); cond] halves.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier = nn.initializers.xavier_uniform()


class EmbedAction(nn.Module):
    num_actions: int
    latent_dim: int
    guidance_uncondp: float = 0.1

    @nn.compact
    def __call__(
        self,
        action_ids: jnp.ndarray,         # (B,) int class ids
        train: bool = False,
        rng: Optional[jax.Array] = None,
        force_mask: bool = False,
    ) -> jnp.ndarray:
        table = self.param("action_embedding", xavier, (self.num_actions, self.latent_dim))
        out = table[action_ids]
        if force_mask:
            out = jnp.zeros_like(out)
        elif train and self.guidance_uncondp > 0 and rng is not None:
            drop = jax.random.bernoulli(rng, self.guidance_uncondp, (out.shape[0], 1))
            out = out * (1.0 - drop)
        return out[:, None, :]  # (B, 1, D) condition token
