"""Config -> system builder (replaces import-by-string instantiation,
`mld/config.py:25-32` + `mld/models/get_model.py:4-17`)."""

from __future__ import annotations

import os
from dataclasses import replace
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.smpl import SmplModel, load_smpl, synthetic_smpl
from ..models.seeme import SeeMeConfig, SeeMeSystem
from ..train.losses import LossWeights
from .loader import Config


def loss_weights_from_config(cfg: Config) -> LossWeights:
    loss = cfg.get("LOSS", {})
    return LossWeights(
        lambda_rec=float(loss.get("LAMBDA_REC", 1.0)),
        lambda_joint=float(loss.get("LAMBDA_JOINT", 1.0)),
        lambda_root=float(loss.get("LAMBDA_ROOT", 1.0)),
        lambda_kl=float(loss.get("LAMBDA_KL", 1e-4)),
    )


def seeme_config_from_yaml(cfg: Config) -> SeeMeConfig:
    model = cfg.model
    abl = cfg.TRAIN.ABLATION
    sched = model.get("scheduler", {})
    return SeeMeConfig(
        dataset_name=cfg.get("DATASET_NAME", "egobody"),
        estimate=cfg.get("ESTIMATE", "wearer"),
        data_type=cfg.get("DATA_TYPE", "angle"),
        predict_transl=bool(abl.get("PREDICT_TRANSL", True)),
        motion_length=int(cfg.get("MOTION_LENGTH", 60)),
        condition=tuple(model.get("condition", [])),
        latent_dim=tuple(model.get("latent_dim", [1, 256])),
        ff_size=int(model.get("ff_size", 128)),
        num_layers=int(model.get("num_layers", 5)),
        num_heads=int(model.get("num_head", model.get("num_heads", 1))),
        # 'droupout' is the reference's yaml key spelling (config_mld_egobody.yaml:119)
        dropout=float(model.get("droupout", model.get("dropout", 0.1))),
        guidance_scale=float(model.get("guidance_scale", 1.0)),
        guidance_uncondp=float(model.get("guidance_uncondp", 0.1)),
        predict_epsilon=bool(abl.get("PREDICT_EPSILON", True)),
        md_trans=bool(abl.get("MD_TRANS", False)),
        mlp_dist=bool(abl.get("MLP_DIST", False)),
        num_inference_timesteps=int(sched.get("num_inference_timesteps", 50)),
        eta=float(sched.get("eta", 0.0)),
        scene_points=int(model.get("scene_points", 20000)),
        scene_feat_dim=int(model.get("scene_feat_dim", 512)),
        use_fused=bool(model.get("use_fused", True)),
        fused_variant=str(model.get("fused_variant", "loop")),
        loss=loss_weights_from_config(cfg),
    )


def load_smpl_or_synthetic(cfg: Config) -> SmplModel:
    """Load the configured SMPL body model; fall back to the deterministic
    synthetic model (same structure) when the asset is absent so every
    pipeline stays runnable in asset-free environments."""
    path = cfg.select("model.smpl_path", "")
    if path and os.path.exists(path):
        return load_smpl(path)
    return synthetic_smpl(n_verts=6890)


def build_t2m_system(cfg: Config, datamodule, use_fused: Optional[bool] = None):
    """Text-to-motion system for humanml3d/kit configs."""
    from ..models.t2m import T2MConfig, T2MSystem
    from ..models.text_encoder import ClipTextEncoder

    model = cfg.model
    abl = cfg.TRAIN.ABLATION
    sched = model.get("scheduler", {})
    loss = cfg.get("LOSS", {})
    t2m_cfg = T2MConfig(
        nfeats=int(getattr(datamodule, "nfeats", model.get("nfeats", 263))),
        max_len=int(cfg.select("DATASET.SAMPLER.MAX_LEN", 196)),
        latent_dim=tuple(model.get("latent_dim", [1, 256])),
        ff_size=int(model.get("ff_size", 128)),
        num_layers=int(model.get("num_layers", 5)),
        num_heads=int(model.get("num_head", model.get("num_heads", 1))),
        dropout=float(model.get("droupout", model.get("dropout", 0.1))),
        text_encoded_dim=int(
            cfg.select("model.denoiser.params.text_encoded_dim", 768) or 768
        ),
        guidance_scale=float(model.get("guidance_scale", 7.5)),
        guidance_uncondp=float(model.get("guidance_uncondp", 0.1)),
        num_inference_timesteps=int(sched.get("num_inference_timesteps", 50)),
        lambda_kl=float(loss.get("LAMBDA_KL", 1e-4)),
        lambda_rec=float(loss.get("LAMBDA_REC", 1.0)),
        lambda_joint=float(loss.get("LAMBDA_JOINT", 1.0)),
        vae_type=str(model.get("vae_type", "mld")),
        mlp_dist=bool(abl.get("MLP_DIST", False)),
        arch=str(cfg.select("model.denoiser.params.arch", "trans_enc")
                 or "trans_enc"),
    )
    if use_fused is not None:
        t2m_cfg = replace(t2m_cfg, use_fused=use_fused)
    # mode selection mirrors the reference (`mld_clip.py:38-48`): the module
    # yaml's modelpath (clip vs bert asset) plus the last_hidden_state flag
    te_params = cfg.select("model.text_encoder.params", {}) or {}
    text_encoder = ClipTextEncoder(
        te_params.get("modelpath") or cfg.select("model.clip_path", None),
        latent_dim=t2m_cfg.text_encoded_dim,
        last_hidden_state=bool(te_params.get("last_hidden_state", False)),
    )
    return T2MSystem(
        t2m_cfg, feats2joints=getattr(datamodule, "feats2joints", None),
        text_encoder=text_encoder,
    ), t2m_cfg


def build_a2m_system(cfg: Config, datamodule, use_fused: Optional[bool] = None):
    """Action-to-motion system for humanact12/uestc configs
    (`configs/base.yaml:89-98` action branch)."""
    from ..models.a2m import A2MConfig, A2MSystem

    model = cfg.model
    sched = model.get("scheduler", {})
    loss = cfg.get("LOSS", {})
    a2m_cfg = A2MConfig(
        nfeats=int(getattr(datamodule, "nfeats", model.get("nfeats", 150))),
        num_frames=int(cfg.select("DATASET.NUM_FRAMES", 60)),
        num_classes=int(getattr(datamodule, "num_classes", 12)),
        latent_dim=tuple(model.get("latent_dim", [1, 256])),
        ff_size=int(model.get("ff_size", 128)),
        num_layers=int(model.get("num_layers", 5)),
        num_heads=int(model.get("num_head", model.get("num_heads", 1))),
        dropout=float(model.get("droupout", model.get("dropout", 0.1))),
        guidance_scale=float(model.get("guidance_scale", 7.5)),
        guidance_uncondp=float(model.get("guidance_uncondp", 0.1)),
        num_inference_timesteps=int(sched.get("num_inference_timesteps", 50)),
        lambda_kl=float(loss.get("LAMBDA_KL", 1e-4)),
        lambda_rec=float(loss.get("LAMBDA_REC", 1.0)),
    )
    if use_fused is not None:
        a2m_cfg = replace(a2m_cfg, use_fused=use_fused)
    return A2MSystem(a2m_cfg), a2m_cfg


def build_system(
    cfg: Config,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    smpl: Optional[SmplModel] = None,
    use_fused: Optional[bool] = None,
) -> Tuple[SeeMeSystem, SeeMeConfig]:
    sys_cfg = seeme_config_from_yaml(cfg)
    if use_fused is not None:
        sys_cfg = replace(sys_cfg, use_fused=use_fused)
    if smpl is None:
        smpl = load_smpl_or_synthetic(cfg)
    if mean is None:
        mean = np.zeros(sys_cfg.nfeats, np.float32)
        std = np.ones(sys_cfg.nfeats, np.float32)
    system = SeeMeSystem(sys_cfg, smpl, jnp.asarray(mean), jnp.asarray(std))
    return system, sys_cfg
