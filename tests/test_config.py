"""Config cascade + builder tests."""

import os

import numpy as np

from seeme_tpu.config import load_config
from seeme_tpu.config.build import build_system, seeme_config_from_yaml

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_cascade_and_interpolation():
    cfg = load_config(os.path.join(CONFIGS, "config_mld_egobody.yaml"))
    # base.yaml merged under experiment yaml
    assert cfg.SEED_VALUE == 1234
    assert cfg.TRAIN.STAGE == "diffusion"
    # module dir merged into model, ${model.nfeats} resolved
    assert cfg.model.denoiser.params.nfeats == 75
    assert cfg.model.denoiser.params.latent_dim == [1, 256]
    assert cfg.model.scheduler.params.beta_start == 0.00085
    # experiment yaml wins over base
    assert cfg.TRAIN.BATCH_SIZE == 64


def test_override_precedence():
    cfg = load_config(
        os.path.join(CONFIGS, "config_mld_egobody.yaml"),
        overrides={"TRAIN": {"BATCH_SIZE": 8}},
    )
    assert cfg.TRAIN.BATCH_SIZE == 8
    assert cfg.TRAIN.STAGE == "diffusion"  # untouched


def test_system_config_mapping():
    cfg = load_config(os.path.join(CONFIGS, "config_mld_egobody.yaml"))
    sc = seeme_config_from_yaml(cfg)
    assert sc.nfeats == 75 and sc.pose_feats == 72
    assert sc.condition == ("interactee", "scene")
    assert sc.md_trans and sc.predict_epsilon and sc.predict_transl
    assert sc.num_inference_timesteps == 50
    assert sc.loss.lambda_kl == 1e-4


def test_gimo_config_dims():
    cfg = load_config(os.path.join(CONFIGS, "config_mld_gimo.yaml"))
    sc = seeme_config_from_yaml(cfg)
    assert sc.dataset_name == "gimo"
    assert sc.pose_feats == 66 and sc.nfeats == 69
    assert sc.body_joints == 21


def test_vae_config_stage():
    cfg = load_config(os.path.join(CONFIGS, "config_vae_egobody.yaml"))
    assert cfg.TRAIN.STAGE == "vae"
    sc = seeme_config_from_yaml(cfg)
    assert not sc.md_trans
    assert sc.condition == ()


def test_build_system_smoke():
    cfg = load_config(os.path.join(CONFIGS, "config_vae_interactee.yaml"))
    system, sc = build_system(cfg)
    assert sc.estimate == "interactee"
    assert system.vae.nfeats == 75


def test_instantiate_from_config_registry():
    from seeme_tpu.config import instantiate_from_config
    from seeme_tpu.models.vae import MotionVae

    cfg = load_config(os.path.join(CONFIGS, "config_mld_egobody.yaml"))
    vae = instantiate_from_config(cfg.model.motion_vae)
    assert isinstance(vae, MotionVae)
    assert vae.nfeats == 75  # ${model.nfeats} resolved through the cascade
    # the reference's dotted target aliases to the native class
    den = instantiate_from_config(
        {"target": "mld.models.architectures.mld_denoiser.MldDenoiser",
         "params": {"nfeats": 75, "ablation": {"ignored": True}}}
    )
    from seeme_tpu.models.denoiser import Denoiser

    assert isinstance(den, Denoiser)
    import pytest

    with pytest.raises(KeyError):
        instantiate_from_config({"target": "evil.module.Thing"})


def test_parse_dotted_overrides():
    from seeme_tpu.config.loader import parse_dotted_overrides

    ov = parse_dotted_overrides(
        ["TEST.MEAN=true", "TEST.FACT=1.5", "NAME=run1", "TRAIN.ABLATION.X=null"]
    )
    assert ov == {
        "TEST": {"MEAN": True, "FACT": 1.5},
        "NAME": "run1",
        "TRAIN": {"ABLATION": {"X": None}},
    }
    import pytest

    with pytest.raises(ValueError):
        parse_dotted_overrides(["TEST.MEAN"])


def test_every_config_loads_and_builds():
    """Every configs/config_*.yaml + render_mld.yaml loads through the
    cascade and maps to a constructed system (the VERDICT r1 'close the
    config surface' contract: nothing in configs/ is dead)."""
    import glob

    import pytest

    from seeme_tpu.config.build import (
        build_a2m_system,
        build_system,
        build_t2m_system,
    )
    from seeme_tpu.config.loader import Config

    paths = sorted(glob.glob(os.path.join(CONFIGS, "config_*.yaml")))
    assert len(paths) >= 12
    for path in paths:
        cfg = load_config(path)
        name = cfg.get("DATASET_NAME")
        dm_stub = Config({})  # builders only read nfeats/feats2joints off it
        if name in ("humanml3d", "kit"):
            system, sys_cfg = build_t2m_system(cfg, dm_stub)
            assert sys_cfg.nfeats > 0
        elif name in ("humanact12", "uestc"):
            system, sys_cfg = build_a2m_system(cfg, dm_stub)
            assert sys_cfg.num_classes in (12, 40)
        else:
            system, sys_cfg = build_system(cfg)
            assert sys_cfg.motion_length > 0
        assert system is not None

    render_cfg = load_config(os.path.join(CONFIGS, "render_mld.yaml"))
    assert render_cfg.select("RENDER.FPS", None) or render_cfg.get("RENDER")
