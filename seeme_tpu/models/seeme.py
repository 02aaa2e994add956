"""SEE-ME system: the composed VAE + latent-diffusion + conditioning stack.

This is the TPU-native redesign of `mld/models/modeltype/mld.py` (the
2130-line LightningModule). Instead of a stateful module that owns optimizers,
metrics, and debug side effects, the system is:

  * a bundle of flax modules (vae / denoiser / scene encoder / condition
    projections) built from one config,
  * pure loss functions `vae_loss` / `diffusion_loss` (the
    `train_vae_forward` / `train_diffusion_forward` semantics,
    `mld.py:633-1017`),
  * a pure `sample` function whose whole DDIM reverse process is one lax.scan
    (`_diffusion_reverse`, `mld.py:432-511`).

Conditioning composition follows `mld.py:991-1013` / `1297-1319`: condition
tokens are concatenated along the token axis in the order
[interactee-latent, scene, image]; classifier-free guidance doubles the batch
as [uncond; cond] (the order `_diffusion_reverse` chunks, `mld.py:488-492`).
Known reference quirk NOT replicated: at eval the reference concatenates the
scene CFG halves in the opposite order from the interactee halves
(`mld.py:1158` vs `1290`), which would mis-pair cond/uncond tokens — harmless
there only because the shipped config has guidance_scale=1.0; we use the
consistent [uncond; cond] order for every condition.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.smpl import SmplModel, smpl_joints24
from ..diffusion.sampling import ddim_sample
from ..diffusion.schedulers import DiffusionSchedule
from ..nn.pointnet import ResnetPointnet
from ..train.losses import LossWeights, diffusion_losses, vae_losses, x0_losses
from .denoiser import Denoiser
from .vae import MotionVae, reparameterize

WEARER, INTERACTEE = 0, 1  # actor indices in the 2-person batch layout


@dataclass(frozen=True)
class SeeMeConfig:
    """Mirrors the knobs of `configs/config_mld_egobody.yaml` that affect the
    compute graph."""

    dataset_name: str = "egobody"          # egobody | gimo
    estimate: str = "wearer"               # wearer | interactee (`ESTIMATE`)
    data_type: str = "angle"               # angle | rot6d
    predict_transl: bool = True            # ABLATION.PREDICT_TRANSL
    motion_length: int = 60                # MOTION_LENGTH
    condition: Tuple[str, ...] = ("interactee", "scene")
    latent_dim: Tuple[int, int] = (1, 256)
    ff_size: int = 128
    num_layers: int = 5
    num_heads: int = 1
    dropout: float = 0.1
    guidance_scale: float = 1.0
    guidance_uncondp: float = 0.1
    predict_epsilon: bool = True
    md_trans: bool = True
    mlp_dist: bool = False                 # ABLATION.MLP_DIST
    num_inference_timesteps: int = 50
    eta: float = 0.0
    scene_points: int = 20000
    scene_feat_dim: int = 512
    # Allow the fused bf16 Pallas reverse-process kernel on TPU. The fused
    # kernel deviates ~0.8% in latent space from the bit-faithful XLA scan
    # (ops/denoiser_fused.py docstring); test.py disables it by default so
    # parity evals run the exact path (opt in via TEST.USE_FUSED=true).
    use_fused: bool = True
    # "loop": fori_loop kernel (one-hot step selects, bf16 in-kernel
    # invariants); "grid": Pallas grid over steps with BlockSpec-streamed
    # per-step rows + f32 XLA-side invariants (ops/denoiser_fused.py v2).
    # A/B via scripts/ddim_roofline.py; same math either way.
    fused_variant: str = "loop"
    loss: LossWeights = field(default_factory=LossWeights)

    @property
    def pose_feats(self) -> int:
        """72 angle dims for the 23-joint egobody layout, 66 for gimo's
        21-joint layout (`mld.py:119-123`); 144 for the rot6d representation
        (24 joints x diffusion-layout 6d, `mld.py:100`)."""
        if self.data_type == "rot6d":
            return 144
        return 72 if self.dataset_name == "egobody" else 66

    @property
    def nfeats(self) -> int:
        if self.data_type == "rot6d":
            return 144  # rot6d path carries no translation (`mld.py:703-742`)
        return self.pose_feats + (3 if self.predict_transl else 0)

    @property
    def body_joints(self) -> int:
        return 23 if self.dataset_name == "egobody" else 21


class ConditionProjection(nn.Module):
    """ReLU -> Linear condition-embedding projection (`mld.py:252-261`)."""

    out_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.out_dim, name="linear")(nn.relu(x))


class SeeMeSystem:
    """Builds modules from a SeeMeConfig and exposes pure step functions.

    Parameter pytree layout (one dict so a single optax optimizer /
    checkpoint covers the trainable surface):
      {'vae': ..., 'denoiser': ..., 'scene_encoder': ..., 'output_scene': ...}
    Stage-2 freezes 'vae' and 'scene_encoder' exactly as the reference does
    (`mld.py:185-208, 267-271`): the train loop masks their gradients.
    """

    def __init__(self, cfg: SeeMeConfig, smpl: SmplModel,
                 mean: jnp.ndarray, std: jnp.ndarray):
        self.cfg = cfg
        self.smpl = smpl
        self.mean_full = jnp.asarray(mean).reshape(-1)
        self.std_full = jnp.asarray(std).reshape(-1)
        self.mean = self.mean_full[: cfg.nfeats]
        self.std = self.std_full[: cfg.nfeats]
        d = cfg.latent_dim[-1]
        self.vae = MotionVae(
            nfeats=cfg.nfeats,
            latent_dim=tuple(cfg.latent_dim),
            ff_size=cfg.ff_size,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            dropout=cfg.dropout,
            mlp_dist=cfg.mlp_dist,
        )
        self.denoiser = Denoiser(
            nfeats=cfg.nfeats,
            latent_dim=tuple(cfg.latent_dim),
            ff_size=cfg.ff_size,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            dropout=cfg.dropout,
            text_encoded_dim=d,
            md_trans=cfg.md_trans,
        )
        self.schedule = DiffusionSchedule()
        self.use_scene = "scene" in cfg.condition
        self.use_interactee = "interactee" in cfg.condition
        self.use_image = "image" in cfg.condition
        if self.use_scene:
            self.scene_encoder = ResnetPointnet(out_dim=cfg.scene_feat_dim)
            self.output_scene = ConditionProjection(d)
        if self.use_image:
            # frozen ResNet50 image encoder + trainable projection
            # (`mld.py:182-208, 251-255, 893-896`)
            from ..nn.resnet import resnet50

            self.image_encoder = resnet50()
            self.output_images = ConditionProjection(d)

    # ------------------------------------------------------------------ setup
    def init_params(self, rng: jax.Array) -> Dict:
        cfg = self.cfg
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        T, F = cfg.motion_length, cfg.nfeats
        d = cfg.latent_dim[-1]
        params = {
            "vae": self.vae.init(r1, jnp.zeros((1, T, F))),
            "denoiser": self.denoiser.init(
                r2,
                jnp.zeros((1, cfg.latent_dim[0], d)),
                jnp.zeros((1,), jnp.int32),
                # unconditional configs still trace with one (zero) token
                jnp.zeros((1, max(self.n_cond_tokens, 1), d)),
            ),
        }
        if self.use_scene:
            params["scene_encoder"] = self.scene_encoder.init(
                r3, jnp.zeros((1, 16, 3))
            )
            params["output_scene"] = self.output_scene.init(
                r4, jnp.zeros((1, cfg.scene_feat_dim))
            )
        if self.use_image:
            ri1, ri2 = jax.random.split(jax.random.fold_in(rng, 5))
            params["image_encoder"] = self.image_encoder.init(
                ri1, jnp.zeros((1, 224, 224, 3)), train=False
            )
            params["output_images"] = self.output_images.init(
                ri2, jnp.zeros((1, 2048))
            )
        return params

    @property
    def n_cond_tokens(self) -> int:
        return int(self.use_interactee) + int(self.use_scene) + int(self.use_image)

    # ------------------------------------------------------------- primitives
    def renorm(self, feats: jnp.ndarray) -> jnp.ndarray:
        """normalized features -> raw (the datamodule `renorm`,
        `mld/data/EgoBody.py:151-157`)."""
        return feats * self.std + self.mean

    def normalize(self, feats: jnp.ndarray) -> jnp.ndarray:
        return (feats - self.mean) / self.std

    def actor_features(self, batch: Dict, actor: int) -> jnp.ndarray:
        """(B, T, nfeats) normalized features of one actor: pose feats,
        plus transl when predict_transl (`mld.py:654-675`); rot6d features
        carry no translation (`mld.py:703-711`)."""
        f = batch["feats"][:, :, actor, :]
        if self.cfg.predict_transl and self.cfg.data_type != "rot6d":
            f = jnp.concatenate([f, batch["transl"][:, actor]], axis=-1)
        return f

    def feats_to_joints(self, feats_raw: jnp.ndarray, betas: jnp.ndarray,
                        transl: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Renormalized (B, T, nfeats) features -> (B, T, 24, 3) joints via
        SMPL FK (the `train_vae_forward` angle path, `mld.py:746-799`).

        GIMO's 21-joint pose is zero-padded to the 23-joint SMPL body pose
        (`mld.py:807-813`). Uses the joints-only fast path — the reference
        runs full LBS and slices [:, :24] (see `smpl_joints24`).
        """
        cfg = self.cfg
        B, T, _ = feats_raw.shape
        if cfg.data_type == "rot6d":
            # diffusion-layout 6d -> rotmats -> FK, no betas/transl
            # (`mld.py:703-742`: smpl called with pose2rot=False, default betas)
            from ..core.rotations import rot6d_to_rotmat

            rotmats = rot6d_to_rotmat(
                feats_raw.reshape(B * T, 24, 6), mode="diffusion"
            )
            joints = smpl_joints24(
                self.smpl,
                jnp.zeros((B * T, 10), feats_raw.dtype),
                rotmats[:, 1:],
                rotmats[:, :1],
                pose2rot=False,
            )
            return joints.reshape(B, T, 24, 3)
        pose = feats_raw[..., 3 : cfg.pose_feats].reshape(B * T, -1)
        if cfg.dataset_name == "gimo":
            pose = jnp.concatenate([pose, jnp.zeros((B * T, 6), pose.dtype)], axis=-1)
        # Conscious fix of a reference quirk: the reference's GIMO branch FKs
        # the PREDICTED pose with the GROUND-TRUTH global orientation
        # (`mld.py:852-858`, tagged "#! change orientation from ref to rst"
        # next to a commented-out "SOTA WERE HERE" line) — debug leftovers
        # that make its GIMO losses/metrics blind to orientation errors.
        # Here every FK uses the features' own orientation slice (SURVEY.md
        # hard-parts #5).
        glob = feats_raw[..., :3].reshape(B * T, 3)
        if cfg.predict_transl:
            trans = feats_raw[..., -3:].reshape(B * T, 3)
        else:
            assert transl is not None
            # batch translations are stored normalized (data contract,
            # `batch.py`); renormalize with the transl slice of mean/std
            P = cfg.pose_feats
            if self.std_full.shape[0] >= P + 3:
                transl = transl * self.std_full[P : P + 3] + self.mean_full[P : P + 3]
            trans = transl.reshape(B * T, 3)
        betas_flat = betas.reshape(B * T, -1)
        joints = smpl_joints24(self.smpl, betas_flat, pose, glob, trans)
        return joints.reshape(B, T, 24, 3)

    def feats_to_vertices(self, feats_raw: jnp.ndarray, betas: jnp.ndarray,
                          transl: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Renormalized (B, T, nfeats) features -> (B, T, V, 3) SMPL mesh
        vertices via the full LBS forward (`smpl_forward`); the mesh-render
        path (reference `fit.py` -> `*_mesh.npy` -> `render.py`). Same feature
        unpacking as `feats_to_joints`; only where vertices are needed."""
        from ..core.smpl import smpl_forward

        cfg = self.cfg
        B, T, _ = feats_raw.shape
        if cfg.data_type == "rot6d":
            from ..core.rotations import rot6d_to_rotmat

            rotmats = rot6d_to_rotmat(
                feats_raw.reshape(B * T, 24, 6), mode="diffusion"
            )
            out = smpl_forward(
                self.smpl, jnp.zeros((B * T, 10), feats_raw.dtype),
                rotmats[:, 1:], rotmats[:, :1], pose2rot=False,
            )
            return out["vertices"].reshape(B, T, -1, 3)
        pose = feats_raw[..., 3 : cfg.pose_feats].reshape(B * T, -1)
        if cfg.dataset_name == "gimo":
            pose = jnp.concatenate([pose, jnp.zeros((B * T, 6), pose.dtype)], axis=-1)
        glob = feats_raw[..., :3].reshape(B * T, 3)
        if cfg.predict_transl:
            trans = feats_raw[..., -3:].reshape(B * T, 3)
        else:
            assert transl is not None
            P = cfg.pose_feats
            if self.std_full.shape[0] >= P + 3:
                transl = transl * self.std_full[P : P + 3] + self.mean_full[P : P + 3]
            trans = transl.reshape(B * T, 3)
        out = smpl_forward(
            self.smpl, betas.reshape(B * T, -1), pose, glob, trans
        )
        return out["vertices"].reshape(B, T, -1, 3)

    def scene_features(self, params: Dict, scene: jnp.ndarray) -> jnp.ndarray:
        """(B, N, 3) point cloud -> (B, 512) frozen-PointNet features — the
        deterministic, parameter-frozen stage of `encode_scene`. The stage-2
        train loop precomputes these once per sample (`train.py`): the
        PointNet is ~90% of the train step (scripts/TRAIN_PROFILE.json), and
        its weights never update after ProHMR pretraining
        (`mld.py:185-208`)."""
        if jax.default_backend() != "cpu":
            from ..ops.pointnet_pallas import pointnet_forward_pallas

            return pointnet_forward_pallas(params["scene_encoder"], scene)
        return self.scene_encoder.apply(params["scene_encoder"], scene)

    def encode_scene(self, params: Dict, scene: jnp.ndarray) -> jnp.ndarray:
        """(B, N, 3) point cloud -> (B, 1, d) condition token
        (`mld.py:911-922`: frozen PointNet then trainable projection).
        Routes through the fused Pallas kernels on TPU (`ops/pointnet_pallas`)."""
        feats = self.scene_features(params, scene)
        return self.output_scene.apply(params["output_scene"], feats)[:, None, :]

    def encode_motion_latent(
        self, vae_params, feats: jnp.ndarray, lengths=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.vae.apply(vae_params, feats, lengths, method=self.vae.encode)

    # ----------------------------------------------------------------- stage 1
    def vae_loss(self, params: Dict, batch: Dict, rng: jax.Array):
        """Stage-1 reconstruction loss (`train_vae_forward`, `mld.py:633-885`)."""
        cfg = self.cfg
        actor = WEARER if cfg.estimate == "wearer" else INTERACTEE
        f_ref = self.actor_features(batch, actor)

        drop_rng, sample_rng = jax.random.split(rng)
        mu, logvar = self.vae.apply(
            params["vae"], f_ref, deterministic=False,
            rngs={"dropout": drop_rng}, method=self.vae.encode,
        )
        z = reparameterize(sample_rng, mu, logvar)
        feats_rst = self.vae.apply(
            params["vae"], z, cfg.motion_length, deterministic=False,
            rngs={"dropout": drop_rng}, method=self.vae.decode,
        )

        raw_ref = self.renorm(f_ref)
        raw_rst = self.renorm(feats_rst)
        betas = batch["betas"][:, actor]
        transl = None if cfg.predict_transl else batch["transl"][:, actor]
        joints_ref = self.feats_to_joints(raw_ref, betas, transl)
        joints_rst = self.feats_to_joints(raw_rst, betas, transl)

        return vae_losses(
            raw_rst, raw_ref, joints_rst, joints_ref, mu, logvar,
            cfg.loss, cfg.predict_transl,
        )

    # ----------------------------------------------------------------- stage 2
    def _condition_tokens(
        self, params: Dict, batch: Dict, rng: Optional[jax.Array], train: bool
    ) -> jnp.ndarray:
        """Build (B, n_cond, d) condition tokens [interactee, scene].

        Training-time CFG zeroes random *elements* of the raw conditioning
        inputs with prob guidance_uncondp before encoding — faithfully
        preserving the reference's elementwise masking (`mld.py:917-919,
        966-981`), which masks elements rather than whole samples.
        """
        cfg = self.cfg
        tokens = []
        do_cfg_train = train and cfg.guidance_scale > 1.0
        if self.use_interactee:
            f_int = self.actor_features(batch, INTERACTEE)
            if do_cfg_train:
                rng, mask_rng = jax.random.split(rng)
                mask = jax.random.uniform(mask_rng, f_int.shape) < cfg.guidance_uncondp
                f_int = jnp.where(mask, 0.0, f_int)
            z_cond, _ = self.encode_motion_latent(params["vae"], f_int)
            tokens.append(z_cond)
        if self.use_scene:
            if "scene_feats" in batch and not do_cfg_train:
                # precomputed frozen-PointNet features (train.py's stage-2
                # cache); only the trainable projection runs per step. The
                # CFG-training path masks the RAW point cloud, so it cannot
                # consume cached features.
                tokens.append(self.output_scene.apply(
                    params["output_scene"], batch["scene_feats"])[:, None, :])
            else:
                scene = batch["scene"]
                if do_cfg_train:
                    rng, mask_rng = jax.random.split(rng)
                    mask = jax.random.uniform(mask_rng, scene.shape) < cfg.guidance_uncondp
                    scene = jnp.where(mask, 0.0, scene)
                tokens.append(self.encode_scene(params, scene))
        if not tokens and not self.use_image:
            # unconditional config: a single zero token (cond_emb=None in the
            # reference degenerates to no conditioning, `mld.py:1012-1013`)
            B = batch["feats"].shape[0]
            tokens.append(jnp.zeros((B, 1, cfg.latent_dim[-1])))
        if self.use_image:
            if "image_feats" in batch:
                # precomputed frozen-ResNet50 features (train.py's stage-2
                # cache, same mechanism as scene_feats): the backbone never
                # updates (`mld.py:235-246`), so only the trainable
                # output_images projection runs per step
                feats = batch["image_feats"]
            else:
                feats = self.image_encoder.apply(
                    params["image_encoder"], batch["image"], train=False
                )
            tokens.append(
                self.output_images.apply(params["output_images"], feats)[:, None, :]
            )
        return jnp.concatenate(tokens, axis=1)

    def image_features(self, params: Dict, image: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) crops -> (B, 2048) frozen-ResNet50 features — the
        deterministic, parameter-frozen stage of the image conditioning
        (`mld.py:1084-1154`); cacheable per sample exactly like
        `scene_features`."""
        return self.image_encoder.apply(
            params["image_encoder"], image, train=False)

    def diffusion_loss(self, params: Dict, batch: Dict, rng: jax.Array):
        """Stage-2 denoiser loss (`train_diffusion_forward` +
        `_diffusion_process`, `mld.py:582-631, 887-1017`)."""
        cfg = self.cfg
        actor = WEARER if cfg.estimate == "wearer" else INTERACTEE
        cond_rng, z_rng, t_rng, noise_rng, drop_rng = jax.random.split(rng, 5)

        f_ref = self.actor_features(batch, actor)
        mu, logvar = self.encode_motion_latent(params["vae"], f_ref)
        z = reparameterize(z_rng, mu, logvar)  # (B, n_tok, d), no grad to vae

        cond = self._condition_tokens(params, batch, cond_rng, train=True)

        B = z.shape[0]
        noise = jax.random.normal(noise_rng, z.shape, z.dtype)
        timesteps = jax.random.randint(
            t_rng, (B,), 0, self.schedule.num_train_timesteps
        )
        noisy = self.schedule.add_noise(z, noise, timesteps)
        pred = self.denoiser.apply(
            params["denoiser"], noisy, timesteps, cond,
            deterministic=False, rngs={"dropout": drop_rng},
        )
        if cfg.predict_epsilon:
            return diffusion_losses(pred, noise)
        return x0_losses(pred, z)

    # ---------------------------------------------------------------- sampling
    def encode_conditioning(self, params: Dict, batch: Dict) -> jnp.ndarray:
        """Eval-time condition tokens, CFG-doubled when guidance > 1.

        Deterministic in (params, batch) — the frozen interactee-VAE /
        PointNet / ResNet encodes — so eval harnesses may compute it once per
        batch and reuse it across replications (`test.py` does; only the
        reverse diffusion below consumes randomness)."""
        cfg = self.cfg
        cond = self._condition_tokens(params, batch, None, train=False)
        if cfg.guidance_scale > 1.0:
            uncond_batch = dict(batch)
            uncond_batch["feats"] = jnp.zeros_like(batch["feats"])
            uncond_batch["transl"] = jnp.zeros_like(batch["transl"])
            if self.use_scene:
                uncond_batch["scene"] = jnp.zeros_like(batch["scene"])
            if self.use_image:
                uncond_batch["image"] = jnp.zeros_like(batch["image"])
            uncond = self._condition_tokens(params, uncond_batch, None, train=False)
            return jnp.concatenate([uncond, cond], axis=0)  # [uncond; cond]
        return cond

    def sample(
        self,
        params: Dict,
        batch: Dict,
        rng: jax.Array,
        lengths: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Conditional generation: cond tokens -> DDIM scan -> VAE decode.

        The `ego_eval` inference path (`mld.py:1269-1364`) with the reverse
        process as one lax.scan. Returns normalized features (B, T, nfeats).
        """
        cond_full = self.encode_conditioning(params, batch)
        return self.sample_from_cond(params, cond_full, rng, lengths)

    def sample_from_cond(
        self,
        params: Dict,
        cond_full: jnp.ndarray,
        rng: jax.Array,
        lengths: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Reverse diffusion + VAE decode from precomputed condition tokens."""
        cfg = self.cfg
        B = cond_full.shape[0] // (2 if cfg.guidance_scale > 1.0 else 1)

        shape = (B, cfg.latent_dim[0], cfg.latent_dim[-1])
        if (
            cfg.use_fused
            and jax.default_backend() != "cpu"
            and cfg.eta == 0.0
            and cfg.md_trans
            and cfg.predict_epsilon
            # hoisted per-layer cond invariants are (B, n_cond, d) f32 x4 x
            # num_layers in VMEM — fine for the 1-3 ego tokens, ruinous for
            # long token sequences
            and cond_full.shape[1] <= 8
        ):
            # whole reverse process as one VMEM-resident Pallas kernel
            # (ops/denoiser_fused.py): ~3x faster than the XLA scan
            from ..ops.denoiser_fused import (
                ddim_fused,
                ddim_fused_grid,
                ddim_schedule_arrays,
            )

            rng, init_rng = jax.random.split(rng)
            z0 = jax.random.normal(init_rng, shape) * self.schedule.init_noise_sigma
            tsa, acp_t, acp_prev = ddim_schedule_arrays(
                self.schedule, cfg.num_inference_timesteps
            )
            impl = (ddim_fused_grid
                    if cfg.fused_variant == "grid" and cfg.latent_dim[0] == 1
                    else ddim_fused)
            # CFG runs inside the kernel: cond_full is the [uncond; cond]
            # doubled batch (`mld.py:467-492`), the per-sample halves mix
            # as eps = uncond + g*(cond - uncond) per step — at the protocol
            # batch 64 this doubles the attention/FFN row count to M=128,
            # exactly filling the 128-row MXU (scripts/DDIM_ROOFLINE.json)
            z = impl(
                params["denoiser"], cond_full, z0, tsa, acp_t, acp_prev,
                num_steps=cfg.num_inference_timesteps,
                num_layers=cfg.num_layers,
                guidance_scale=cfg.guidance_scale,
            )
        else:

            def denoiser_fn(x, t, step_rng):
                return self.denoiser.apply(params["denoiser"], x, t, cond_full)

            z = ddim_sample(
                denoiser_fn,
                self.schedule,
                rng,
                shape,
                num_inference_steps=cfg.num_inference_timesteps,
                eta=cfg.eta,
                guidance_scale=cfg.guidance_scale,
            )
        return self.vae.apply(
            params["vae"], z, cfg.motion_length, lengths, method=self.vae.decode
        )

    def eval_outputs(
        self, params: Dict, batch: Dict, rng: jax.Array, stage: str = "diffusion"
    ) -> Dict[str, jnp.ndarray]:
        """Full eval forward (`ego_eval`, `mld.py:1076-1905`): sample (or
        reconstruct for stage 'vae'), renorm, SMPL FK on prediction / ground
        truth / interactee, plus global-orientation quaternions for the
        head-orientation metric (`mld.py:1460-1555`)."""
        if stage == "vae":
            feats_rst = self.reconstruct(params, batch, rng)
        else:
            feats_rst = self.sample(params, batch, rng)
        return self.eval_fk(params, batch, feats_rst)

    def eval_fk(
        self, params: Dict, batch: Dict, feats_rst: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """The FK/quaternion half of the eval forward — separately jittable so
        the sampling graph (which embeds the fused Pallas kernels) and the FK
        graph compile independently."""
        from ..core.rotations import aa_to_quat

        cfg = self.cfg
        actor = WEARER if cfg.estimate == "wearer" else INTERACTEE
        other = INTERACTEE if actor == WEARER else WEARER

        raw_rst = self.renorm(feats_rst)
        raw_ref = self.renorm(self.actor_features(batch, actor))
        raw_int = self.renorm(self.actor_features(batch, other))

        betas = batch["betas"][:, actor]
        betas_int = batch["betas"][:, other]
        transl = None if cfg.predict_transl else batch["transl"][:, actor]
        transl_int = None if cfg.predict_transl else batch["transl"][:, other]

        joints_rst = self.feats_to_joints(raw_rst, betas, transl)
        joints_ref = self.feats_to_joints(raw_ref, betas, transl)
        joints_int = self.feats_to_joints(raw_int, betas_int, transl_int)

        if cfg.data_type == "rot6d":
            from ..core.rotations import rot6d_to_rotmat, rotmat_to_quat

            quat_rst = rotmat_to_quat(rot6d_to_rotmat(raw_rst[..., :6], "diffusion"))
            quat_ref = rotmat_to_quat(rot6d_to_rotmat(raw_ref[..., :6], "diffusion"))
        else:
            quat_rst = aa_to_quat(raw_rst[..., :3])
            quat_ref = aa_to_quat(raw_ref[..., :3])
        return {
            "feats_rst": feats_rst,
            "joints_rst": joints_rst,
            "joints_ref": joints_ref,
            "joints_int": joints_int,
            "quat_rst": quat_rst,
            "quat_ref": quat_ref,
        }

    def reconstruct(
        self, params: Dict, batch: Dict, rng: jax.Array,
        sample_mean: bool = False, fact: Optional[float] = None,
    ) -> jnp.ndarray:
        """VAE-only eval path (stage 'vae', `mld.py:1328-1360`).

        sample_mean / fact mirror `sample_from_distribution`
        (`mld.py:335-358`, the TEST.MEAN / TEST.FACT overrides): mean
        reconstruction, or eps rescaled by fact."""
        cfg = self.cfg
        actor = WEARER if cfg.estimate == "wearer" else INTERACTEE
        f_ref = self.actor_features(batch, actor)
        mu, logvar = self.encode_motion_latent(params["vae"], f_ref)
        if sample_mean:
            z = mu
        else:
            z = reparameterize(rng, mu, logvar, fact=fact)
        return self.vae.apply(
            params["vae"], z, cfg.motion_length, method=self.vae.decode
        )
