"""Action-to-motion system (HumanAct12 / UESTC — the legacy MLD configs).

Same VAE + latent-diffusion stack conditioned on a learned action-class
embedding (`EmbedAction`, `mld_denoiser.py:247-296`) instead of text. Motion
features are rot6d pose + optional root translation at fixed NUM_FRAMES=60
(`configs/base.yaml:89-98`). Batches: {motion (B, T, F), action (B,),
length (B,)}.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.masks import lengths_to_mask
from ..diffusion.sampling import ddim_sample
from ..diffusion.schedulers import DiffusionSchedule
from ..nn.action import EmbedAction
from ..train.losses import diffusion_losses, kl_standard_normal, smooth_l1
from .denoiser import Denoiser
from .vae import MotionVae, reparameterize


@dataclass(frozen=True)
class A2MConfig:
    nfeats: int = 150   # 24 joints x rot6d + root transl (humanact12 layout)
    num_frames: int = 60
    num_classes: int = 12
    latent_dim: Tuple[int, int] = (1, 256)
    ff_size: int = 128
    num_layers: int = 5
    num_heads: int = 1
    dropout: float = 0.1
    guidance_scale: float = 7.5
    guidance_uncondp: float = 0.1
    num_inference_timesteps: int = 50
    lambda_kl: float = 1e-4
    lambda_rec: float = 1.0
    # fused Pallas sampling on TPU; disable for bit-faithful scan sampling
    use_fused: bool = True


class A2MSystem:
    def __init__(self, cfg: A2MConfig):
        self.cfg = cfg
        d = cfg.latent_dim[-1]
        self.vae = MotionVae(
            nfeats=cfg.nfeats, latent_dim=tuple(cfg.latent_dim),
            ff_size=cfg.ff_size, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, dropout=cfg.dropout,
        )
        self.denoiser = Denoiser(
            nfeats=cfg.nfeats, latent_dim=tuple(cfg.latent_dim),
            ff_size=cfg.ff_size, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, dropout=cfg.dropout,
            text_encoded_dim=d, md_trans=False,
        )
        self.embed_action = EmbedAction(cfg.num_classes, d, cfg.guidance_uncondp)
        self.schedule = DiffusionSchedule()

    def init_params(self, rng: jax.Array) -> Dict:
        cfg = self.cfg
        r1, r2, r3 = jax.random.split(rng, 3)
        d = cfg.latent_dim[-1]
        return {
            "vae": self.vae.init(r1, jnp.zeros((1, cfg.num_frames, cfg.nfeats))),
            "denoiser": self.denoiser.init(
                r2, jnp.zeros((1, cfg.latent_dim[0], d)),
                jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, d)),
            ),
            "embed_action": self.embed_action.init(r3, jnp.zeros((1,), jnp.int32)),
        }

    def vae_loss(self, params, batch, rng):
        cfg = self.cfg
        motion, lengths = batch["motion"], batch["length"]
        d_rng, z_rng = jax.random.split(rng)
        mu, logvar = self.vae.apply(
            params["vae"], motion, lengths, deterministic=False,
            rngs={"dropout": d_rng}, method=self.vae.encode,
        )
        z = reparameterize(z_rng, mu, logvar)
        rst = self.vae.apply(
            params["vae"], z, cfg.num_frames, lengths, deterministic=False,
            rngs={"dropout": d_rng}, method=self.vae.decode,
        )
        mask = lengths_to_mask(lengths, cfg.num_frames)[..., None]
        rec = smooth_l1(rst * mask, motion * mask)
        kl = kl_standard_normal(mu, logvar)
        total = cfg.lambda_rec * rec + cfg.lambda_kl * kl
        return total, {"recons_feature": rec, "kl_motion": kl, "total": total}

    def diffusion_loss(self, params, batch, rng):
        cfg = self.cfg
        z_rng, a_rng, t_rng, n_rng, d_rng = jax.random.split(rng, 5)
        mu, logvar = self.vae.apply(
            params["vae"], batch["motion"], batch["length"], method=self.vae.encode
        )
        z = reparameterize(z_rng, mu, logvar)
        cond = self.embed_action.apply(
            params["embed_action"], batch["action"], train=True,
            rng=a_rng, rngs={},
        )
        B = z.shape[0]
        noise = jax.random.normal(n_rng, z.shape)
        t = jax.random.randint(t_rng, (B,), 0, self.schedule.num_train_timesteps)
        noisy = self.schedule.add_noise(z, noise, t)
        pred = self.denoiser.apply(
            params["denoiser"], noisy, t, cond,
            deterministic=False, rngs={"dropout": d_rng},
        )
        return diffusion_losses(pred, noise)

    def sample(self, params, action_ids, rng, lengths=None):
        cfg = self.cfg
        cond = self.embed_action.apply(params["embed_action"], action_ids)
        B = cond.shape[0]
        if cfg.guidance_scale > 1.0:
            cond = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)

        shape = (B, cfg.latent_dim[0], cfg.latent_dim[1])
        if cfg.use_fused and jax.default_backend() != "cpu" and cond.shape[1] <= 8:
            # same VMEM-resident reverse-process kernel the t2m/ego branches
            # use (ops/denoiser_fused.py); the action embedding is a single
            # condition token on the plain token-concat denoiser path
            from ..ops.denoiser_fused import ddim_fused, ddim_schedule_arrays

            rng, init_rng = jax.random.split(rng)
            z0 = jax.random.normal(init_rng, shape) * self.schedule.init_noise_sigma
            tsa, acp_t, acp_prev = ddim_schedule_arrays(
                self.schedule, cfg.num_inference_timesteps
            )
            z = ddim_fused(
                params["denoiser"], cond, z0, tsa, acp_t, acp_prev,
                num_steps=cfg.num_inference_timesteps,
                num_layers=cfg.num_layers,
                guidance_scale=cfg.guidance_scale,
                md_trans=False,
            )
        else:

            def denoiser_fn(x, t, step_rng):
                return self.denoiser.apply(params["denoiser"], x, t, cond)

            z = ddim_sample(
                denoiser_fn, self.schedule, rng,
                shape,
                num_inference_steps=cfg.num_inference_timesteps,
                guidance_scale=cfg.guidance_scale,
            )
        return self.vae.apply(
            params["vae"], z, cfg.num_frames, lengths, method=self.vae.decode
        )

    def feats_to_joints(self, smpl, feats, translation: bool = True):
        """FK sampled rot6d features to SMPL joints for rendering / metrics
        (the reference routes a2m outputs through Rotation2xyz,
        `mld/models/operator/rotation2xyz.py:14-119`)."""
        from ..core.rotation2xyz import rot6d_motion_to_joints

        return rot6d_motion_to_joints(smpl, feats, translation=translation)
