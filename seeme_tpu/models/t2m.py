"""Text-to-motion system (HumanML3D / KIT): the legacy-MLD path.

The same MotionVae + Denoiser stack as SEE-ME, conditioned on a frozen CLIP
text embedding instead of interactee/scene tokens (`mld.py:360-408` forward,
`t2m_eval` `mld.py:1907-1996`). Variable length is handled with masks over a
static max_len. CFG doubles the batch with empty-caption embeddings
(`mld.py:369-376`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.masks import lengths_to_mask
from ..diffusion.sampling import ddim_sample
from ..diffusion.schedulers import DiffusionSchedule
from ..train.losses import diffusion_losses, kl_standard_normal, smooth_l1
from .denoiser import Denoiser
from .vae import MotionVae, reparameterize


@dataclass(frozen=True)
class T2MConfig:
    nfeats: int = 263
    max_len: int = 196
    latent_dim: Tuple[int, int] = (1, 256)
    ff_size: int = 128
    num_layers: int = 5
    num_heads: int = 1
    dropout: float = 0.1
    text_encoded_dim: int = 768
    guidance_scale: float = 7.5
    guidance_uncondp: float = 0.1
    num_inference_timesteps: int = 50
    lambda_kl: float = 1e-4
    lambda_rec: float = 1.0
    lambda_joint: float = 1.0
    # fused Pallas sampling on TPU; disable for bit-faithful scan sampling
    # (guidance amplifies the bf16 weight-storage rounding ~linearly)
    use_fused: bool = True
    # 77-token clip_hidden/bert modes always sample via the XLA scan: a
    # sample-grid Pallas kernel (built round 4, multi-sample packing added
    # round 5) measured 0.72x the scan at k=1 and monotonically WORSE with
    # packing (scripts/TOKEN_BENCH.json, B=32/guidance 7.5: scan 18.7 vs
    # fused 25.9/29.3/32.6 ms at k=1/4/8 — packed attention is a dense
    # masked (n_cfg*k*S)^2 block, so its flops grow ~k-fold while the
    # 79-token per-step compute already amortizes the scan's dispatch
    # overhead). The kernel was deleted with that measurement as the
    # decision record (BASELINE.md "Long-conditioning").
    # VAE_TYPE: 'mld' (latent diffusion) or 'no' (diffusion directly over
    # per-frame features — `config_novae_humanml3d.yaml`, `mld.py:935-946`)
    vae_type: str = "mld"
    # the reference MldVae ctor HARD-CODES num_layers=5/ff_size=128
    # (`mld_vae.py:51-53`) regardless of the yaml, while the denoiser takes
    # both from config — so converted checkpoints can carry different vae /
    # denoiser widths. None = share the denoiser's values (the shipped
    # configs, where both are 5/128).
    vae_num_layers: int = None
    vae_ff_size: int = None
    # denoiser arch: 'trans_enc' (U-skip) or 'trans_dec' (the novae config)
    arch: str = "trans_enc"
    mlp_dist: bool = False  # ABLATION.MLP_DIST (`mld_vae.py:107-110`)


class T2MSystem:
    def __init__(self, cfg: T2MConfig, feats2joints=None, text_encoder=None):
        self.cfg = cfg
        self.feats2joints = feats2joints    # normalized feats -> joints (RIC)
        self.text_encoder = text_encoder    # host-side caption embedder
        self.diffusion_only = cfg.vae_type == "no"
        if not self.diffusion_only:
            self.vae = MotionVae(
                nfeats=cfg.nfeats, latent_dim=tuple(cfg.latent_dim),
                ff_size=cfg.vae_ff_size or cfg.ff_size,
                num_layers=cfg.vae_num_layers or cfg.num_layers,
                num_heads=cfg.num_heads, dropout=cfg.dropout,
                mlp_dist=cfg.mlp_dist,
            )
        self.denoiser = Denoiser(
            nfeats=cfg.nfeats, latent_dim=tuple(cfg.latent_dim),
            ff_size=cfg.ff_size, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, dropout=cfg.dropout,
            text_encoded_dim=cfg.text_encoded_dim, md_trans=False,
            diffusion_only=self.diffusion_only, arch=cfg.arch,
        )
        self.schedule = DiffusionSchedule()

    def _denoiser_sample_shape(self):
        cfg = self.cfg
        if self.diffusion_only:  # latents ARE padded features (`mld.py:443-447`)
            return (1, cfg.max_len, cfg.nfeats)
        return (1, cfg.latent_dim[0], cfg.latent_dim[1])

    def init_params(self, rng: jax.Array) -> Dict:
        cfg = self.cfg
        r1, r2 = jax.random.split(rng)
        params = {
            "denoiser": self.denoiser.init(
                r2,
                jnp.zeros(self._denoiser_sample_shape()),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 1, cfg.text_encoded_dim)),
                jnp.ones((1,), jnp.int32),
            ),
        }
        if not self.diffusion_only:
            params["vae"] = self.vae.init(
                r1, jnp.zeros((1, cfg.max_len, cfg.nfeats)))
        return params

    # ------------------------------------------------------------------ vae
    def vae_loss(self, params: Dict, batch: Dict, rng: jax.Array,
                 feats2joints=None):
        if self.diffusion_only:
            raise ValueError("vae stage is undefined for VAE_TYPE 'no' "
                             "(config_novae_*: train stage diffusion only)")
        if feats2joints is None:
            feats2joints = self.feats2joints
        cfg = self.cfg
        motion, lengths = batch["motion"], batch["length"]
        drop_rng, z_rng = jax.random.split(rng)
        mu, logvar = self.vae.apply(
            params["vae"], motion, lengths, deterministic=False,
            rngs={"dropout": drop_rng}, method=self.vae.encode,
        )
        z = reparameterize(z_rng, mu, logvar)
        rst = self.vae.apply(
            params["vae"], z, cfg.max_len, lengths, deterministic=False,
            rngs={"dropout": drop_rng}, method=self.vae.decode,
        )
        mask = lengths_to_mask(lengths, cfg.max_len)[..., None]
        terms = {}
        terms["recons_feature"] = smooth_l1(rst * mask, motion * mask)
        total = cfg.lambda_rec * terms["recons_feature"]
        if feats2joints is not None:
            j_rst = feats2joints(rst)
            j_ref = feats2joints(motion)
            m4 = mask[..., None]
            terms["recons_joints"] = smooth_l1(j_rst * m4, j_ref * m4)
            total += cfg.lambda_joint * terms["recons_joints"]
        terms["kl_motion"] = kl_standard_normal(mu, logvar)
        total += cfg.lambda_kl * terms["kl_motion"]
        terms["total"] = total
        return total, terms

    # ------------------------------------------------------------ diffusion
    def diffusion_loss(self, params: Dict, batch: Dict, rng: jax.Array):
        """Train-time CFG: whole-sample text dropout with prob
        guidance_uncondp (the standard MLD text path; uncond = zero
        embedding)."""
        cfg = self.cfg
        motion, lengths = batch["motion"], batch["length"]
        text_emb = batch["text_emb"]
        if text_emb.ndim == 2:
            text_emb = text_emb[:, None, :]
        z_rng, m_rng, t_rng, n_rng, d_rng = jax.random.split(rng, 5)
        if self.diffusion_only:
            # diffusion over padded per-frame features (`mld.py:935-946`)
            z = motion
        else:
            mu, logvar = self.vae.apply(
                params["vae"], motion, lengths, method=self.vae.encode
            )
            z = reparameterize(z_rng, mu, logvar)
        drop = jax.random.bernoulli(
            m_rng, cfg.guidance_uncondp, (text_emb.shape[0], 1, 1)
        )
        text_emb = jnp.where(drop, 0.0, text_emb)
        B = z.shape[0]
        noise = jax.random.normal(n_rng, z.shape)
        t = jax.random.randint(t_rng, (B,), 0, self.schedule.num_train_timesteps)
        noisy = self.schedule.add_noise(z, noise, t)
        pred = self.denoiser.apply(
            params["denoiser"], noisy, t, text_emb,
            lengths if self.diffusion_only else None,
            deterministic=False, rngs={"dropout": d_rng},
            cond_mask=batch.get("text_mask"),
        )
        if self.diffusion_only:
            # padded frames are zeroed by the denoiser; mask the target too
            mask = lengths_to_mask(lengths, cfg.max_len)[..., None]
            noise = noise * mask
        return diffusion_losses(pred, noise)

    # -------------------------------------------------------------- sampling
    def sample(
        self, params: Dict, text_emb: jnp.ndarray, rng: jax.Array,
        lengths: Optional[jnp.ndarray] = None,
        nframes: Optional[int] = None,
        cond_mask: Optional[jnp.ndarray] = None,  # (B, n_cond) True = valid
        z_init: Optional[jnp.ndarray] = None,     # parity-replay initial noise
    ) -> jnp.ndarray:
        """text embedding (B, 1, 768) -> motion features (B, T, nfeats)."""
        cfg = self.cfg
        if text_emb.ndim == 2:
            text_emb = text_emb[:, None, :]
        B = text_emb.shape[0]
        if cfg.guidance_scale > 1.0:
            cond = jnp.concatenate([jnp.zeros_like(text_emb), text_emb], axis=0)
            if cond_mask is not None:
                cond_mask = jnp.concatenate([cond_mask, cond_mask], axis=0)
        else:
            cond = text_emb

        if self.diffusion_only:
            T = nframes or cfg.max_len
            if lengths is None:
                lengths = jnp.full((B,), T, jnp.int32)

            def denoiser_fn(x, t, step_rng):
                L = jnp.concatenate([lengths] * 2) if cfg.guidance_scale > 1.0 else lengths
                return self.denoiser.apply(params["denoiser"], x, t, cond, L,
                                           cond_mask=cond_mask)

            return ddim_sample(
                denoiser_fn, self.schedule, rng, (B, T, cfg.nfeats),
                num_inference_steps=cfg.num_inference_timesteps,
                guidance_scale=cfg.guidance_scale,
                z_init=z_init,
            )

        shape = (B, cfg.latent_dim[0], cfg.latent_dim[1])
        # token modes (cond_mask set / >8 cond tokens) always take the XLA
        # scan — measured faster than every fused variant (T2MConfig note)
        pooled_cond = cond.shape[1] <= 8 and cond_mask is None
        use_fused = (cfg.use_fused and pooled_cond
                     and jax.default_backend() != "cpu")
        if use_fused:
            # whole (CFG) reverse process in one VMEM-resident Pallas kernel
            from ..ops.denoiser_fused import ddim_fused, ddim_schedule_arrays

            rng, init_rng = jax.random.split(rng)
            z0 = (jnp.asarray(z_init, jnp.float32) if z_init is not None
                  else jax.random.normal(init_rng, shape))
            z0 = z0 * self.schedule.init_noise_sigma
            tsa, acp_t, acp_prev = ddim_schedule_arrays(
                self.schedule, cfg.num_inference_timesteps
            )
            # pooled-token modes: per-layer cond projections hoisted
            # into VMEM once per window (`ddim_fused`)
            z = ddim_fused(
                params["denoiser"], cond, z0, tsa, acp_t, acp_prev,
                num_steps=cfg.num_inference_timesteps,
                num_layers=cfg.num_layers,
                guidance_scale=cfg.guidance_scale,
                md_trans=False,
            )
        else:

            def denoiser_fn(x, t, step_rng):
                return self.denoiser.apply(params["denoiser"], x, t, cond,
                                           cond_mask=cond_mask)

            z = ddim_sample(
                denoiser_fn, self.schedule, rng,
                shape,
                num_inference_steps=cfg.num_inference_timesteps,
                guidance_scale=cfg.guidance_scale,
                z_init=z_init,
            )
        return self.vae.apply(
            params["vae"], z, nframes or cfg.max_len, lengths,
            method=self.vae.decode,
        )

    def reconstruct(self, params: Dict, batch: Dict, rng: jax.Array):
        cfg = self.cfg
        mu, logvar = self.vae.apply(
            params["vae"], batch["motion"], batch["length"], method=self.vae.encode
        )
        z = reparameterize(rng, mu, logvar)
        return self.vae.apply(
            params["vae"], z, cfg.max_len, batch["length"], method=self.vae.decode
        )
