"""Latent-diffusion denoiser.

Reimplements `mld/models/architectures/mld_denoiser.py:18-244` batch-first:
sinusoidal timestep embedding -> MLP, optional condition projection, then a
U-skip transformer over the latent tokens. Two block types, selected by
``md_trans`` exactly as `ABLATION.MD_TRANS` selects them in the reference:

  * md_trans=True (the shipped EgoBody config): MdTransformerLayer blocks —
    self-attention over [latents; cond; time], linear cross-attention over the
    condition tokens, stylized FFN (`mld_denoiser.py:101-109, 198-213`).
  * md_trans=False: plain encoder blocks over the token concatenation
    [latents; time; cond] (`mld_denoiser.py:110-121, 188-199`), keeping the
    first ``n_latent`` output tokens.

Also supports the diffusion-only ablation (VAE_TYPE='no',
`config_novae_humanml3d.yaml`): latents are per-frame features, embedded by
``pose_embd`` and projected back by ``pose_proj`` with padded frames zeroed
(`mld_denoiser.py:56-59, 215-220`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..core.masks import lengths_to_mask
from ..nn.embeddings import (
    TimestepEmbedding,
    build_position_encoding,
    sinusoidal_timestep_embedding,
)
from ..nn.stylization import MdTransformerLayer
from ..nn.transformer import (
    SkipTransformerEncoder,
    TransformerDecoder,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
)


class Denoiser(nn.Module):
    nfeats: int = 75
    latent_dim: Sequence[int] = (1, 256)
    ff_size: int = 128
    num_layers: int = 5
    num_heads: int = 1
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    text_encoded_dim: int = 256
    position_embedding: str = "learned"
    md_trans: bool = True
    diffusion_only: bool = False
    # 'trans_enc' (U-skip encoder, the shipped configs) or 'trans_dec'
    # (plain cross-attention decoder over the condition tokens — the
    # `configs/modules_novae/denoiser.yaml` arch, `mld_denoiser.py:133-149`)
    arch: str = "trans_enc"

    @property
    def d_model(self) -> int:
        return self.latent_dim[-1]

    def setup(self):
        d = self.d_model
        self.time_embedding = TimestepEmbedding(d)
        if self.text_encoded_dim != d:
            self.emb_proj = nn.Dense(d, name="emb_proj_dense")
        self.query_pos = build_position_encoding(d, self.position_embedding)

        if self.diffusion_only:
            self.pose_embd = nn.Dense(d, name="pose_embd")
            self.pose_proj = nn.Dense(self.nfeats, name="pose_proj")

        if self.arch == "trans_dec":
            self.mem_pos = build_position_encoding(d, self.position_embedding)

            def make_dec_layer(name):
                return TransformerDecoderLayer(
                    d, self.num_heads, self.ff_size, self.dropout,
                    self.activation, self.normalize_before, name=name,
                )

            self.decoder = TransformerDecoder(make_dec_layer, self.num_layers, d)
            return

        if self.md_trans:

            def make_layer(name):
                return MdTransformerLayer(
                    d, self.num_heads, ffn_dim=self.ff_size, dropout=self.dropout, name=name
                )

        else:

            def make_layer(name):
                return TransformerEncoderLayer(
                    d, self.num_heads, self.ff_size, self.dropout,
                    self.activation, self.normalize_before, name=name,
                )

        self.encoder = SkipTransformerEncoder(make_layer, self.num_layers, d)

    def __call__(
        self,
        sample: jnp.ndarray,       # (B, n_latent_tokens, D) noisy latents
        timesteps: jnp.ndarray,    # (B,) or scalar int
        cond: jnp.ndarray,         # (B, n_cond_tokens, text_encoded_dim)
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        cond_mask: Optional[jnp.ndarray] = None,  # (B, n_cond) True = valid
    ) -> jnp.ndarray:
        B = sample.shape[0]
        n_latent = sample.shape[1]
        timesteps = jnp.broadcast_to(jnp.asarray(timesteps), (B,))

        t_emb = sinusoidal_timestep_embedding(
            timesteps, self.text_encoded_dim, self.flip_sin_to_cos, self.freq_shift
        ).astype(sample.dtype)
        time_emb = self.time_embedding(t_emb)[:, None, :]  # (B, 1, D)

        if self.text_encoded_dim != self.d_model:
            # reference: Sequential(ReLU, Linear) — ReLU first (`mld_denoiser.py:72-74`)
            cond_emb = self.emb_proj(nn.relu(cond))
        else:
            cond_emb = cond

        # fixed-length padded condition tokens (clip_hidden/bert) are excluded
        # from attention, not merely zeroed (the reference pads only to the
        # longest caption in the batch — ADVICE r2)
        ones1 = jnp.ones((B, 1), bool)

        if self.arch == "trans_dec":
            # tgt = (embedded) sample tokens; memory = [time; cond] tokens
            # (`mld_denoiser.py:222-239`)
            if self.diffusion_only:
                sample = self.pose_embd(sample)
            memory = jnp.concatenate([time_emb, cond_emb], axis=1)
            xseq = self.query_pos(sample)
            memory = self.mem_pos(memory)
            mem_valid = (None if cond_mask is None
                         else jnp.concatenate([ones1, cond_mask], axis=1))
            out = self.decoder(xseq, memory, memory_valid_mask=mem_valid,
                               deterministic=deterministic)
            if self.diffusion_only:
                out = self.pose_proj(out)
                if lengths is not None:
                    mask = lengths_to_mask(lengths, out.shape[1])
                    out = out * mask[..., None]
            return out

        if self.diffusion_only:
            sample = self.pose_embd(sample)
            xseq = jnp.concatenate([time_emb, cond_emb, sample], axis=1)
            n_prefix = 1 + cond_emb.shape[1]
            xseq = self.query_pos(xseq)
            key_valid = None
            if cond_mask is not None:
                frames = jnp.ones((B, sample.shape[1]), bool)
                key_valid = jnp.concatenate([ones1, cond_mask, frames], axis=1)
            tokens = self.encoder(xseq, deterministic=deterministic,
                                  key_valid_mask=key_valid)
            out = self.pose_proj(tokens[:, n_prefix:])
            if lengths is not None:
                mask = lengths_to_mask(lengths, out.shape[1])
                out = out * mask[..., None]
            return out

        if self.md_trans:
            xseq = self.query_pos(sample)
            tokens = self.encoder(
                xseq, deterministic=deterministic, xf=cond_emb, emb=time_emb,
                xf_valid_mask=cond_mask,
            )
            return tokens[:, :n_latent]

        xseq = jnp.concatenate([sample, time_emb, cond_emb], axis=1)
        xseq = self.query_pos(xseq)
        key_valid = None
        if cond_mask is not None:
            latents = jnp.ones((B, n_latent), bool)
            key_valid = jnp.concatenate([latents, ones1, cond_mask], axis=1)
        tokens = self.encoder(xseq, deterministic=deterministic,
                              key_valid_mask=key_valid)
        return tokens[:, :n_latent]
