"""Transformer motion VAE.

Reimplements `mld/models/architectures/mld_vae.py:33-256` batch-first in flax:
learned distribution tokens are prepended to the embedded frame sequence, the
U-skip encoder produces (mu, logvar) from the first tokens, and the decoder
cross-attends zero queries against the latent as memory
(arch='encoder_decoder', the shipped config).

Reference quirk, preserved as *defaults* rather than a silent override: the
reference ctor hard-codes num_layers=5, num_heads=1, ff_size=128 regardless of
yaml (`mld_vae.py:51-53`); our defaults match those effective values, and the
config loader maps the vae module onto them (SURVEY.md hard-parts #5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.masks import lengths_to_mask
from ..nn.embeddings import build_position_encoding
from ..nn.transformer import (
    SkipTransformerDecoder,
    SkipTransformerEncoder,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
)


class MotionVae(nn.Module):
    nfeats: int
    latent_dim: Sequence[int] = (1, 256)
    ff_size: int = 128
    num_layers: int = 5
    num_heads: int = 1
    dropout: float = 0.1
    arch: str = "encoder_decoder"
    normalize_before: bool = False
    activation: str = "gelu"
    position_embedding: str = "learned"
    # ABLATION.MLP_DIST (`mld_vae.py:59, 107-110, 183-187`): latent_size
    # dist tokens projected to (mu, logvar) by a 2d-wide linear, instead of
    # 2*latent_size tokens split in half. Off in every shipped config.
    mlp_dist: bool = False

    @property
    def latent_size(self) -> int:
        return self.latent_dim[0]

    @property
    def d_model(self) -> int:
        return self.latent_dim[-1]

    def setup(self):
        d = self.d_model

        def enc_layer(name):
            return TransformerEncoderLayer(
                d, self.num_heads, self.ff_size, self.dropout,
                self.activation, self.normalize_before, name=name,
            )

        def dec_layer(name):
            return TransformerDecoderLayer(
                d, self.num_heads, self.ff_size, self.dropout,
                self.activation, self.normalize_before, name=name,
            )

        self.query_pos_encoder = build_position_encoding(d, self.position_embedding)
        self.query_pos_decoder = build_position_encoding(d, self.position_embedding)
        self.encoder = SkipTransformerEncoder(enc_layer, self.num_layers, d)
        if self.arch == "all_encoder":
            self.decoder = SkipTransformerEncoder(enc_layer, self.num_layers, d)
        elif self.arch == "encoder_decoder":
            self.decoder = SkipTransformerDecoder(dec_layer, self.num_layers, d)
        else:
            raise ValueError(f"unsupported arch {self.arch}")

        # MLP_DIST=False: latent_size mu-tokens + latent_size logvar-tokens
        # (`mld_vae.py:111-113`); MLP_DIST=True: latent_size tokens + a
        # dist_layer projection to 2d (`mld_vae.py:107-110`). N(0,1) init
        # like torch.randn.
        n_tok = self.latent_size if self.mlp_dist else self.latent_size * 2
        self.global_motion_token = self.param(
            "global_motion_token",
            nn.initializers.normal(stddev=1.0),
            (n_tok, d),
        )
        if self.mlp_dist:
            self.dist_layer = nn.Dense(2 * d, name="dist_layer")
        self.skel_embedding = nn.Dense(d, name="skel_embedding")
        self.final_layer = nn.Dense(self.nfeats, name="final_layer")

    def encode(
        self,
        features: jnp.ndarray,            # (B, T, nfeats)
        lengths: Optional[jnp.ndarray] = None,  # (B,) or None = all full
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (mu, logvar), each (B, latent_size, d_model).

        Sampling is the caller's job (explicit PRNG threading replaces the
        reference's `dist.rsample()` at `mld_vae.py:189-193`).
        """
        B, T, _ = features.shape
        mask = (
            lengths_to_mask(lengths, T)
            if lengths is not None
            else jnp.ones((B, T), dtype=bool)
        )

        x = self.skel_embedding(features)
        dist_tokens = jnp.broadcast_to(
            self.global_motion_token[None], (B,) + self.global_motion_token.shape
        )
        xseq = jnp.concatenate([dist_tokens, x], axis=1)
        aug_mask = jnp.concatenate(
            [jnp.ones((B, dist_tokens.shape[1]), dtype=bool), mask], axis=1
        )
        xseq = self.query_pos_encoder(xseq)
        out = self.encoder(xseq, key_valid_mask=aug_mask, deterministic=deterministic)
        dist = out[:, : dist_tokens.shape[1]]
        if self.mlp_dist:
            tokens_dist = self.dist_layer(dist)
            mu = tokens_dist[..., : self.d_model]
            logvar = tokens_dist[..., self.d_model :]
        else:
            mu = dist[:, : self.latent_size]
            logvar = dist[:, self.latent_size :]
        return mu, logvar

    def decode(
        self,
        z: jnp.ndarray,                   # (B, latent_size, d_model)
        nframes: int,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """(B, latent_size, D) latent -> (B, nframes, nfeats) motion features."""
        B = z.shape[0]
        mask = (
            lengths_to_mask(lengths, nframes)
            if lengths is not None
            else jnp.ones((B, nframes), dtype=bool)
        )
        queries = jnp.zeros((B, nframes, self.d_model), z.dtype)

        if self.arch == "all_encoder":
            xseq = jnp.concatenate([z, queries], axis=1)
            aug_mask = jnp.concatenate(
                [jnp.ones((B, self.latent_size), dtype=bool), mask], axis=1
            )
            xseq = self.query_pos_decoder(xseq)
            output = self.decoder(
                xseq, key_valid_mask=aug_mask, deterministic=deterministic
            )[:, self.latent_size :]
        else:
            queries = self.query_pos_decoder(queries)
            output = self.decoder(
                queries, z, tgt_valid_mask=mask, deterministic=deterministic
            )

        return self.final_layer(output)

    def __call__(self, features, lengths=None, deterministic: bool = True):
        """Init/shape-check path: encode then decode the mean latent."""
        mu, logvar = self.encode(features, lengths, deterministic)
        return self.decode(mu, features.shape[1], lengths, deterministic), mu, logvar


def reparameterize(
    rng: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray, fact: Optional[float] = None
) -> jnp.ndarray:
    """z = mu + fact * sigma * eps — the reference's `sample_from_distribution`
    rescaled-eps trick (`mld.py:335-358`); fact=None means fact=1."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    if fact is not None:
        eps = eps * fact
    return mu + std * eps
