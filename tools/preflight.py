#!/usr/bin/env python
"""Assets -> parity in one command.

Scans `deps/` and `datasets/` for the external assets documented in
`prepare/README.md` (this environment has zero egress, so they arrive out of
band), runs the right `tools/convert_checkpoint.py` kind for every torch
checkpoint found, executes real-weight forward-parity checks against the
GENUINE reference modules at `/root/reference` (the same modules
`tests/test_parity_reference.py` verifies with random weights), and prints a
ready / not-ready table plus the exact next command for anything missing.

The day real assets land, quality parity is:

    python tools/preflight.py            # scan + convert + parity
    python tools/preflight.py --scan     # table only, no conversion

Converted checkpoints go to `deps/converted/<name>/` (orbax), matching what
the configs' TEST.CHECKPOINTS / PROSCENE paths and `test.py` consume.

Checkpoint-loading conventions mirrored here: the reference strips `smpl.*`
keys from ProHMR/EgoHMR weights (`mld.py:193-208`, `mld.py:235-246`), loads
Lightning MLD state dicts whole (`train.py:169-182`), and reads the t2m
evaluators from `deps/t2m/<name>/.../model/finest.tar`
(`mld/data/get_data.py:31-33`).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import types
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

sys.path.insert(0, os.path.dirname(__file__))          # tools/
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE = "/root/reference"


# --------------------------------------------------------------------------
# reference-module import (same import-only stubs as the parity test suite)
# --------------------------------------------------------------------------

def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def _install_ref_stubs() -> None:
    for p in (REFERENCE, os.path.join(REFERENCE, "nflows"),
              os.path.join(REFERENCE, "EgoHMR")):
        if p not in sys.path:
            sys.path.append(p)  # append: never shadow repo imports
    if "clip" not in sys.modules:
        sys.modules["clip"] = types.ModuleType("clip")
    if "UMNN" not in sys.modules:
        umnn = types.ModuleType("UMNN")
        umnn.NeuralIntegral = object
        umnn.ParallelNeuralIntegral = object
        sys.modules["UMNN"] = umnn
    if "smplx" not in sys.modules:
        smplx = types.ModuleType("smplx")
        smplx.__path__ = []
        smplx.SMPLLayer = object
        lbs = types.ModuleType("smplx.lbs")
        lbs.vertices2joints = lambda *a, **k: None
        body_models = types.ModuleType("smplx.body_models")
        body_models.SMPLHLayer = object
        smplx.lbs, smplx.body_models = lbs, body_models
        sys.modules["smplx"] = smplx
        sys.modules["smplx.lbs"] = lbs
        sys.modules["smplx.body_models"] = body_models
    if "yacs" not in sys.modules:
        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = type("CfgNode", (dict,), {})
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    if "omegaconf" not in sys.modules:
        # `mld/models/metrics/__init__.py` -> compute.py -> mld.config ->
        # omegaconf; import-only (parse_args is never called here)
        oc = types.ModuleType("omegaconf")
        oc.OmegaConf = type("OmegaConf", (), {})
        sys.modules["omegaconf"] = oc
    if "torchmetrics" not in sys.modules:
        # minimal plumbing stub so the GENUINE metric classes
        # (`mld/models/metrics/tm2t.py`, `mr.py`) import: Metric is only a
        # state-registration base there (no sync — single process), and
        # pairwise_euclidean_distance is imported but unused at runtime
        # (they call their own euclidean_distance_matrix). All metric MATH
        # stays reference code.
        import torch as _torch

        class _Metric(_torch.nn.Module):
            def __init__(self, dist_sync_on_step=False, **kw):
                super().__init__()

            def add_state(self, name, default=None, dist_reduce_fx=None):
                setattr(self, name, default)

        tm = types.ModuleType("torchmetrics")
        tm.Metric = _Metric
        tmf = types.ModuleType("torchmetrics.functional")
        tmf.pairwise_euclidean_distance = lambda a, b: _torch.cdist(a, b)
        tm.functional = tmf
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.functional"] = tmf


def _import_ref(name: str):
    _install_ref_stubs()
    import importlib

    return importlib.import_module(name)


# --------------------------------------------------------------------------
# result plumbing
# --------------------------------------------------------------------------

@dataclass
class Row:
    asset: str
    status: str            # MISSING / FOUND / CONVERTED / PARITY-OK / PARITY-FAIL / ERROR
    detail: str = ""
    action: str = ""


@dataclass
class Ctx:
    deps: str
    datasets: str
    out: str
    do_convert: bool
    do_parity: bool
    rows: List[Row] = field(default_factory=list)


def _load_sd(path: str) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("state_dict", ckpt)


def _save_converted(ctx: Ctx, name: str, params: Dict) -> str:
    from seeme_tpu.train.checkpoint import save_params

    dst = os.path.join(ctx.out, name)
    save_params(dst, params)
    return dst


def _max_err(a, b) -> float:
    import numpy as np

    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


# --------------------------------------------------------------------------
# per-kind real-weight parity checks. Each takes the torch state dict of the
# REAL checkpoint, loads it into the genuine reference module, runs a fixed
# input, converts, runs our module, and returns (max_abs_err, detail).
# --------------------------------------------------------------------------

def parity_mld(sd: Dict) -> tuple:
    """Genuine MldVae + MldDenoiser forward vs converted params. Hyperparams
    are inferred from the state dict so any released variant works."""
    from types import SimpleNamespace

    import jax.numpy as jnp
    import numpy as np
    import torch

    from convert_checkpoint import convert_mld_checkpoint
    from seeme_tpu.models.denoiser import Denoiser
    from seeme_tpu.models.vae import MotionVae

    ref_vae = _import_ref("mld.models.architectures.mld_vae")
    ref_den = _import_ref("mld.models.architectures.mld_denoiser")

    # ---- VAE (ctor hard-codes num_layers=5/num_heads=1/ff_size=128,
    # `mld_vae.py:51-53`)
    nfeats = sd["vae.skel_embedding.weight"].shape[1]
    n_tok, d = sd["vae.global_motion_token"].shape
    latent_size = n_tok // 2
    ablation = SimpleNamespace(MLP_DIST=False, PE_TYPE="mld")
    tvae = ref_vae.MldVae(ablation, nfeats=nfeats,
                          latent_dim=[latent_size, d],
                          arch="encoder_decoder",
                          position_embedding="learned").eval()
    tvae.load_state_dict(
        {k[len("vae."):]: v for k, v in sd.items() if k.startswith("vae.")})

    torch.manual_seed(0)
    B, T = 2, 16
    feats = torch.randn(B, T, nfeats)
    lengths = [T, T - 4]
    with torch.no_grad():
        _, dist = tvae.encode(feats, lengths=lengths)
        mu_t = dist.loc
        rst_t = tvae.decode(mu_t, lengths)

    params = convert_mld_checkpoint(sd)  # per-subtree layer inference
    m = MotionVae(nfeats=nfeats, latent_dim=(latent_size, d), ff_size=128,
                  num_layers=5, num_heads=1)
    len_j = jnp.asarray(np.array(lengths))
    mu_j, _ = m.apply(params["vae"], jnp.asarray(feats.numpy()), len_j,
                      method="encode")
    err = _max_err(mu_j, mu_t.permute(1, 0, 2).numpy())
    rst_j = m.apply(params["vae"], mu_j, T, len_j, method="decode")
    err = max(err, _max_err(rst_j, rst_t.numpy()))

    detail = f"vae nfeats={nfeats} latent=({latent_size},{d})"

    # ---- denoiser (only when the checkpoint has one — stage-1 ckpts don't).
    # Hyperparams inferred from the state dict; num_heads is NOT inferable
    # from shapes, so the flagship value 4 (configs/modules/denoiser.yaml) is
    # used on BOTH sides — parity here verifies conversion, the eval config
    # supplies the operational head count.
    den_sd = {k[len("denoiser."):]: v for k, v in sd.items()
              if k.startswith("denoiser.")}
    if den_sd:
        from convert_checkpoint import infer_md_trans, infer_skip_layers

        md_trans = infer_md_trans(den_sd)
        num_layers = infer_skip_layers(den_sd)
        dd = den_sd["time_embedding.linear_2.weight"].shape[0]
        ff_key = ("encoder.input_blocks.0.ffn.linear1.weight" if md_trans
                  else "encoder.input_blocks.0.linear1.weight")
        ff = den_sd[ff_key].shape[0]
        text_dim = (den_sd["emb_proj.1.weight"].shape[1]
                    if "emb_proj.1.weight" in den_sd else dd)
        ablation = SimpleNamespace(SKIP_CONNECT=True, VAE_TYPE="mld",
                                   DIFF_PE_TYPE="mld", MD_TRANS=md_trans)
        tden = ref_den.MldDenoiser(
            ablation, condition="text", latent_dim=[latent_size, dd],
            ff_size=ff, num_layers=num_layers, num_heads=4,
            text_encoded_dim=text_dim, arch="trans_enc",
            position_embedding="learned").eval()
        try:
            tden.load_state_dict(den_sd)
        except RuntimeError as e:
            return err, detail + f" (denoiser arch not inferred: {e})"
        sample = torch.randn(B, latent_size, dd)
        cond = torch.randn(2, B, text_dim)
        with torch.no_grad():
            (out_t,) = tden(sample, torch.tensor(41), cond)
        mj = Denoiser(latent_dim=(latent_size, dd), ff_size=ff,
                      num_layers=num_layers, num_heads=4,
                      text_encoded_dim=text_dim, md_trans=md_trans)
        out_j = mj.apply(params["denoiser"], jnp.asarray(sample.numpy()),
                         jnp.full((B,), 41, jnp.int32),
                         jnp.asarray(cond.permute(1, 0, 2).numpy()))
        err = max(err, _max_err(out_j, out_t.numpy()))
        detail += f" + denoiser L={num_layers} ff={ff} md_trans={md_trans}"
    return err, detail


def parity_prohmr(sd: Dict) -> tuple:
    """ResNet50 + PointNet + ConditionalGlow log_prob with the real weights
    vs the converted params (`prohmr_scene.py:99-161`)."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from convert_checkpoint import convert_glow, convert_pointnet, convert_resnet50
    from seeme_tpu.flows.glow import GlowConfig, glow_log_prob
    from seeme_tpu.nn.pointnet import ResnetPointnet
    from seeme_tpu.nn.resnet import resnet50

    sd = {k: v for k, v in sd.items() if not k.startswith("smpl")}
    ref_resnet = _import_ref("EgoHMR.models.resnet")
    ref_pointnet = _import_ref("EgoHMR.models.respointnet")
    ref_glow = _import_ref("nflows.flows.glow")

    torch.manual_seed(0)
    errs = []

    tnet = ref_resnet.ResNet(ref_resnet.Bottleneck, [3, 4, 6, 3]).eval()
    tnet.load_state_dict({k[len("backbone."):]: v for k, v in sd.items()
                          if k.startswith("backbone.")})
    img = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        out_t = tnet(img)
    variables = convert_resnet50(sd, "backbone")
    out_j = resnet50().apply(
        variables, jnp.asarray(img.permute(0, 2, 3, 1).numpy()), train=False)
    errs.append(_max_err(out_j, out_t.numpy()))

    hid = sd["scene_enc.fc_pos_0.weight"].shape[0] // 2
    out_dim = sd["scene_enc.fc_c.weight"].shape[0]
    tpn = ref_pointnet.ResnetPointnet(out_dim=out_dim, hidden_dim=hid).eval()
    tpn.load_state_dict({k[len("scene_enc."):]: v for k, v in sd.items()
                         if k.startswith("scene_enc.")})
    pts = torch.randn(2, 256, 3)
    with torch.no_grad():
        pn_t = tpn(pts)
    pn_params = convert_pointnet(
        {k[len("scene_enc."):]: v for k, v in sd.items()
         if k.startswith("scene_enc.")})
    pn_j = ResnetPointnet(out_dim=out_dim, hidden_dim=hid).apply(
        pn_params, jnp.asarray(pts.numpy()))
    errs.append(_max_err(pn_j, pn_t.numpy()))

    # flow: infer layer count / depth / ctx dim from the state dict (the
    # same inference the converter uses — one implementation, no drift)
    from convert_checkpoint import infer_glow_shape

    n_layers, depth, D, hidden, ctx_dim = infer_glow_shape(sd, prefix="flow.flow")
    g = ref_glow.ConditionalGlow(features=D, hidden_features=hidden,
                                 num_layers=n_layers,
                                 num_blocks_per_layer=depth,
                                 context_features=ctx_dim).eval()
    g.load_state_dict({k[len("flow.flow."):]: v for k, v in sd.items()
                       if k.startswith("flow.flow.")})
    x, ctx = torch.randn(2, D), torch.randn(2, ctx_dim)
    with torch.no_grad():
        lp_t, _ = g.log_prob(x, context=ctx)
    cfgj = GlowConfig(features=D, hidden_features=hidden, num_layers=n_layers,
                      num_blocks_per_layer=depth, context_features=ctx_dim)
    glow_params = convert_glow(
        {f"flow.{k[len('flow.flow.'):]}": v for k, v in sd.items()
         if k.startswith("flow.flow.")}, "flow", n_layers, depth)
    lp_j, _ = glow_log_prob(glow_params, cfgj, jnp.asarray(x.numpy()),
                            jnp.asarray(ctx.numpy()))
    errs.append(_max_err(lp_j, lp_t.numpy()))

    return max(errs), (f"resnet {errs[0]:.2e} / pointnet {errs[1]:.2e} / "
                       f"glow lp {errs[2]:.2e}")


def parity_egohmr(sd: Dict) -> tuple:
    """Per-module real-weight parity for the diffusion-GCN checkpoint:
    ResNet50 backbone, scene PointNet, and the ModulatedGCN denoiser
    (`egohmr.py:94-147`)."""
    import jax.numpy as jnp
    import torch

    from convert_checkpoint import convert_egohmr, convert_pointnet, convert_resnet50
    from seeme_tpu.nn.gcn import ModulatedGCN, smpl_adjacency
    from seeme_tpu.nn.pointnet import ResnetPointnet
    from seeme_tpu.nn.resnet import resnet50

    sd = {k: v for k, v in sd.items()
          if not k.startswith(("smpl", "criterion"))}
    ref_resnet = _import_ref("EgoHMR.models.resnet")
    ref_pointnet = _import_ref("EgoHMR.models.respointnet")
    ref_gcn = _import_ref("EgoHMR.models.egohmr.modulated_gcn.modulated_gcn")

    torch.manual_seed(0)
    errs = []
    from convert_checkpoint import infer_gcn_layers

    L = infer_gcn_layers(sd) or 4
    params = convert_egohmr(sd, num_gcn_layers=L)

    tnet = ref_resnet.ResNet(ref_resnet.Bottleneck, [3, 4, 6, 3]).eval()
    tnet.load_state_dict({k[len("backbone."):]: v for k, v in sd.items()
                          if k.startswith("backbone.")})
    img = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        out_t = tnet(img)
    out_j = resnet50().apply(
        convert_resnet50(sd, "backbone"),
        jnp.asarray(img.permute(0, 2, 3, 1).numpy()), train=False)
    errs.append(_max_err(out_j, out_t.numpy()))

    pn_prefix = ("scene_enc." if any(k.startswith("scene_enc.") for k in sd)
                 else "pcd_enc.")
    pn_sd = {k[len(pn_prefix):]: v for k, v in sd.items()
             if k.startswith(pn_prefix)}
    if pn_sd:
        hid = pn_sd["fc_pos_0.weight"].shape[0] // 2
        out_dim = pn_sd["fc_c.weight"].shape[0]
        tpn = ref_pointnet.ResnetPointnet(out_dim=out_dim,
                                          hidden_dim=hid).eval()
        tpn.load_state_dict(pn_sd)
        pts = torch.randn(2, 256, 3)
        with torch.no_grad():
            pn_t = tpn(pts)
        pn_j = ResnetPointnet(out_dim=out_dim, hidden_dim=hid).apply(
            convert_pointnet(pn_sd), jnp.asarray(pts.numpy()))
        errs.append(_max_err(pn_j, pn_t.numpy()))

    # ModulatedGCN denoiser with the real adjacency (`egohmr.py:94-102`);
    # checkpoint keys under `diffusion_model.` (convert_checkpoint.py:389-)
    gcn_sd = {k[len("diffusion_model."):]: v for k, v in sd.items()
              if k.startswith("diffusion_model.")}
    if gcn_sd:
        import numpy as np

        in_dim = gcn_sd["gconv_input.0.gconv.W"].shape[-2]
        hid = gcn_sd["gconv_input.0.gconv.W"].shape[-1]
        out_dim = gcn_sd["gconv_output.W"].shape[-1]
        adj = smpl_adjacency()
        tgcn = ref_gcn.ModulatedGCN(torch.tensor(np.asarray(adj)),
                                    in_dim=in_dim, out_dim=out_dim,
                                    hid_dim=hid, num_layers=L).eval()
        tgcn.load_state_dict(gcn_sd)
        x = torch.randn(2, adj.shape[0], in_dim)
        with torch.no_grad():
            gcn_t = tgcn(x)
        mj = ModulatedGCN(adj=np.asarray(adj), hid_dim=hid, out_dim=out_dim,
                          num_layers=L)
        gcn_j = mj.apply(params["gcn"], jnp.asarray(x.numpy()), train=False)
        errs.append(_max_err(gcn_j, gcn_t.numpy()))

    return max(errs), " / ".join(f"{e:.2e}" for e in errs)


def parity_t2m(sd: Dict, which: str) -> tuple:
    """Real-weight t2m evaluator parity (text / motion / movement encoders,
    `t2m_textenc.py:6-48`, `t2m_motionenc.py:6-62`)."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from convert_checkpoint import (
        convert_t2m_motionencoder,
        convert_t2m_movementencoder,
        convert_t2m_textencoder,
    )
    from seeme_tpu.eval.t2m_evaluator import (
        MotionEncoderBiGRUCo,
        MovementConvEncoder,
        TextEncoderBiGRUCo,
    )

    torch.manual_seed(0)
    ref_text = _import_ref("mld.models.architectures.t2m_textenc")
    ref_motion = _import_ref("mld.models.architectures.t2m_motionenc")

    if which == "text":
        # pos_emb: Linear(pos_size -> word_size); input_emb: Linear(word_size
        # -> hidden) (`t2m_textenc.py:6-20`)
        pos_size = sd["pos_emb.weight"].shape[1]
        word_size = sd["input_emb.weight"].shape[1]
        hidden = sd["gru.weight_hh_l0"].shape[1]
        out = sd["output_net.3.weight"].shape[0]
        t = ref_text.TextEncoderBiGRUCo(word_size=word_size,
                                        pos_size=pos_size,
                                        hidden_size=hidden,
                                        output_size=out).eval()
        t.load_state_dict(sd)
        B, T = 2, 6
        words = torch.randn(B, T, word_size)
        pos = torch.randn(B, T, pos_size)
        lens = torch.tensor([T, T - 2])
        with torch.no_grad():
            out_t = t(words, pos, lens)
        params = convert_t2m_textencoder(sd)
        mj = TextEncoderBiGRUCo(word_size=word_size, pos_size=pos_size,
                                hidden_size=hidden, output_size=out)
        out_j = mj.apply(params, jnp.asarray(words.numpy()),
                         jnp.asarray(pos.numpy()),
                         jnp.asarray(np.array([T, T - 2])))
        return _max_err(out_j, out_t.numpy()), f"text out={out}"
    if which == "motion":
        inp = sd["input_emb.weight"].shape[1]
        hidden = sd["gru.weight_hh_l0"].shape[1]
        out = sd["output_net.3.weight"].shape[0]
        t = ref_motion.MotionEncoderBiGRUCo(
            input_size=inp, hidden_size=hidden, output_size=out).eval()
        t.load_state_dict(sd)
        B, T = 2, 8
        x = torch.randn(B, T, inp)
        lens = torch.tensor([T, T - 3])
        with torch.no_grad():
            out_t = t(x, lens)
        params = convert_t2m_motionencoder(sd)
        mj = MotionEncoderBiGRUCo(input_size=inp, hidden_size=hidden,
                                  output_size=out)
        out_j = mj.apply(params, jnp.asarray(x.numpy()),
                         jnp.asarray(np.array([T, T - 3])))
        return _max_err(out_j, out_t.numpy()), f"motion out={out}"
    # movement
    inp = sd["main.0.weight"].shape[1]
    hid = sd["main.0.weight"].shape[0]
    out = sd["out_net.weight"].shape[0]
    t = ref_motion.MovementConvEncoder(inp, hid, out).eval()
    t.load_state_dict(sd)
    B, T = 2, 12
    x = torch.randn(B, T, inp)
    with torch.no_grad():
        out_t = t(x)
    params = convert_t2m_movementencoder(sd)
    mj = MovementConvEncoder(hidden_size=hid, output_size=out)
    out_j = mj.apply(params, jnp.asarray(x.numpy()))
    return _max_err(out_j, out_t.numpy()), f"move out={out}"


def parity_a2m_gru(sd: Dict) -> tuple:
    """humanact12 GRU action classifier (`humanact12_gru.py:6-57`,
    `metrics/gru.py:10`). The reference's default initHidden is an unseeded
    randn — zeros are passed explicitly on the torch side, matching our
    deterministic port (the convention documented in
    eval/action_classifier.py)."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from convert_checkpoint import convert_a2m_gru
    from seeme_tpu.eval.action_classifier import MotionDiscriminator

    ref_gru = _import_ref("mld.models.architectures.humanact12_gru")
    torch.manual_seed(0)
    inp = sd["recurrent.weight_ih_l0"].shape[1]
    hid = sd["recurrent.weight_hh_l0"].shape[1]
    n_cls = sd["linear2.weight"].shape[0]
    n_layers = 1 + max(int(k.split("_l")[-1])
                       for k in sd if k.startswith("recurrent.weight_ih_l"))
    t = ref_gru.MotionDiscriminator(
        input_size=inp, hidden_size=hid, hidden_layer=n_layers,
        output_size=n_cls).eval()
    t.load_state_dict(sd)
    B, T = 2, 10
    x = torch.randn(B, inp, 1, T)  # (bs, njoints, nfeats, T)
    lens = torch.tensor([T, T - 2])
    with torch.no_grad():
        h0 = torch.zeros(n_layers, B, hid)
        out_t = t(x, lengths=lens, hidden_unit=h0)
    params = convert_a2m_gru(sd)
    mj = MotionDiscriminator(hidden_size=hid, num_layers=n_layers,
                             output_size=n_cls)
    x_btd = x.reshape(B, inp, T).permute(0, 2, 1)
    out_j, _ = mj.apply(params, jnp.asarray(x_btd.numpy()),
                        jnp.asarray(np.array([T, T - 2])))
    return _max_err(out_j, out_t.numpy()), f"classes={n_cls}"


def parity_uestc_stgcn(sd: Dict) -> tuple:
    """UESTC ST-GCN recognition model (`uestc_stgcn.py:26-111`,
    `metrics/stgcn.py:30-43`). The genuine Graph needs a kintree_table.pkl
    — fabricated here from the canonical SMPL PARENTS (the pkl IS that
    table), so no asset is required for the check itself."""
    import pickle
    import tempfile

    import jax.numpy as jnp
    import numpy as np
    import torch

    from convert_checkpoint import convert_uestc_stgcn
    from seeme_tpu.core.smpl import PARENTS
    from seeme_tpu.eval.stgcn import STGCN

    ref_stgcn = _import_ref("mld.models.architectures.uestc_stgcn")
    torch.manual_seed(0)
    n_cls = sd["fcn.weight"].shape[0]
    V = 24  # SMPL layout (`uestc_stgcn.py:261-267`)
    C = sd["data_bn.weight"].shape[0] // V
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        kt = np.stack([np.asarray(PARENTS, np.int64),
                       np.arange(V, dtype=np.int64)])
        pickle.dump(kt, f)
        kintree_path = f.name
    t = ref_stgcn.STGCN(in_channels=C, num_class=n_cls,
                        kintree_path=kintree_path,
                        graph_args={"layout": "smpl", "strategy": "spatial"},
                        edge_importance_weighting=True).eval()
    t.load_state_dict(sd)
    B, T = 2, 8
    # reference forward takes (N, J, C, T) and permutes to (N, C, T, V, 1)
    # (`uestc_stgcn.py:72-80`); ours takes (N, T, V, C)
    x = torch.randn(B, V, C, T)
    with torch.no_grad():
        out_t = t(x)
    params = convert_uestc_stgcn(sd)
    mj = STGCN(in_channels=C, num_class=n_cls)
    x_j = jnp.asarray(x.permute(0, 3, 1, 2).numpy())
    logits_j, feats_j = mj.apply(params, x_j)
    err = _max_err(logits_j, out_t["yhat"].numpy())
    err = max(err, _max_err(feats_j, out_t["features"].numpy()))
    return err, f"classes={n_cls} in_ch={C}"


# --------------------------------------------------------------------------
# asset specs
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# end-to-end metric parity (--end-to-end): generation -> evaluator
# embeddings -> metric values, converted-vs-genuine on one shared batch
# --------------------------------------------------------------------------

def end_to_end_t2m(mld_sd: Dict, t2m_sd: Dict, n: int = 40, T: int = 24,
                   steps: int = 5, guidance: float = 2.5) -> tuple:
    """Metric-LEVEL parity on the t2m chain (VERDICT r4 next #7).

    Forward parity proves each module; this proves the COMPOSED protocol:
    both sides generate from the identical initial noise and text
    conditioning, embed with the t2m evaluator weights, and compute the
    metric values test.py reports —

      JAX:   converted weights -> T2MSystem.sample (the XLA scan test.py
             runs on CPU) -> T2MEvaluator -> TM2TMetrics + MRMetrics
             (the exact classes `test.py::_t2m_eval` uses)
      torch: GENUINE MldVae/MldDenoiser/t2m encoders with the original
             weights -> the reference DDIM update (`mld.py:455-511`, eta=0,
             schedule arrays golden-tested vs the real diffusion lib in
             tests/test_parity_reference.py) -> the GENUINE TM2TMetrics /
             MRMetrics (`tm2t.py`, `mr.py`; torchmetrics plumbing stubbed)
             with GENUINE recover_from_ric joints

    Both metric stacks consume the same shuffle permutation (the reference
    shuffles with torch.randperm, `tm2t.py:89` — replayed into our
    TM2TMetrics.shuffle_idx hook). Diversity is excluded from the strict
    comparison: both sides estimate it over RNG-drawn pairs that no shared
    seed can align (reference: global np.random, `utils.py:230-243`).
    Returns (max |metric delta| as the parity err, detail string).

    Uses equal sequence lengths so the reference MRMetrics' padded-frame
    accumulation quirk (`mr.py:74-97`: full padded rows summed, divided by
    sum(lengths)) and our length-sliced accumulation agree exactly.
    """
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from convert_checkpoint import (
        convert_mld_checkpoint,
        convert_t2m_motionencoder,
        convert_t2m_movementencoder,
        convert_t2m_textencoder,
        infer_md_trans,
        infer_skip_layers,
    )

    ref_vae = _import_ref("mld.models.architectures.mld_vae")
    ref_den = _import_ref("mld.models.architectures.mld_denoiser")
    ref_tenc = _import_ref("mld.models.architectures.t2m_textenc")
    ref_menc = _import_ref("mld.models.architectures.t2m_motionenc")
    ref_tm2t = _import_ref("mld.models.metrics.tm2t")
    ref_mr = _import_ref("mld.models.metrics.mr")
    ref_mp = _import_ref("mld.data.humanml.scripts.motion_process")

    # ---- dims inferred from the state dicts (same rules as parity_mld)
    nfeats = mld_sd["vae.skel_embedding.weight"].shape[1]
    n_tok, d = mld_sd["vae.global_motion_token"].shape
    latent_size = n_tok // 2
    den_sd = {k[len("denoiser."):]: v for k, v in mld_sd.items()
              if k.startswith("denoiser.")}
    if not den_sd:
        return float("nan"), "stage-1 checkpoint (no denoiser) - skipped"
    if infer_md_trans(den_sd):
        return float("nan"), "md_trans denoiser: not a t2m chain - skipped"
    num_layers = infer_skip_layers(den_sd)
    ff = den_sd["encoder.input_blocks.0.linear1.weight"].shape[0]
    vae_sd = {k[len("vae."):]: v for k, v in mld_sd.items()
              if k.startswith("vae.")}
    vae_ff = vae_sd["encoder.input_blocks.0.linear1.weight"].shape[0]
    vae_layers = infer_skip_layers(
        {k: v for k, v in vae_sd.items() if k.startswith("encoder.")})
    text_dim = (den_sd["emb_proj.1.weight"].shape[1]
                if "emb_proj.1.weight" in den_sd else d)
    joints_num = (nfeats + 1) // 12              # 12j - 1 = nfeats (RIC)
    if 12 * joints_num - 1 != nfeats:
        return float("nan"), (f"nfeats={nfeats} is not a RIC layout "
                              "(12j-1) - skipped")

    # ---- shared inputs: GT motions, text conditioning, initial noise
    rng = np.random.RandomState(11)
    gt = (0.1 * rng.randn(n, T, nfeats)).astype(np.float32)
    gt[..., :4] += 0.5                            # plausible root rows
    lengths = np.full((n,), T, np.int64)
    text_emb = rng.randn(n, 1, text_dim).astype(np.float32)
    z0 = rng.randn(n, latent_size, d).astype(np.float32)
    captions = [f"a person performs action {i % 7}" for i in range(n)]

    # =================================================== JAX (converted) side
    from seeme_tpu.eval.t2m_evaluator import T2MEvaluator
    from seeme_tpu.eval.t2m_metrics import MRMetrics, TM2TMetrics
    from seeme_tpu.models.t2m import T2MConfig, T2MSystem

    params = convert_mld_checkpoint(mld_sd)
    cfg = T2MConfig(nfeats=nfeats, max_len=T,
                    latent_dim=(latent_size, d), ff_size=ff,
                    num_layers=num_layers, num_heads=1,
                    vae_ff_size=vae_ff, vae_num_layers=vae_layers,
                    text_encoded_dim=text_dim, guidance_scale=guidance,
                    num_inference_timesteps=steps, use_fused=False)
    system = T2MSystem(cfg)
    feats_rst_j = np.asarray(system.sample(
        params, jnp.asarray(text_emb), jax.random.PRNGKey(0),
        lengths=jnp.asarray(lengths), z_init=jnp.asarray(z0)))

    # evaluator widths inferred from the trio's state dict (released
    # text_mot_match: 300/15 -> 512 -> 512; fabricated self-test uses
    # smaller hiddens at the same 300/15 GloVe input contract)
    text_sd = _sub_sd(t2m_sd, "text_encoder.")
    move_sd = _sub_sd(t2m_sd, "movement_encoder.")
    mot_sd = _sub_sd(t2m_sd, "motion_encoder.")
    word_size, pos_size = text_sd["pos_emb.weight"].shape
    if (word_size, pos_size) != (300, 15):
        return float("nan"), (f"text encoder expects ({word_size}, "
                              f"{pos_size}) inputs, not GloVe 300/POS 15 "
                              "- skipped")
    out_size = text_sd["output_net.3.weight"].shape[0]
    move_in = move_sd["main.0.weight"].shape[1]
    if move_in != nfeats - 4:
        return float("nan"), (f"evaluator movement input {move_in} != "
                              f"nfeats-4 ({nfeats - 4}) - mismatched assets")
    evaluator = T2MEvaluator(
        nfeats=nfeats, word_size=word_size, pos_size=pos_size,
        text_hidden=text_sd["input_emb.weight"].shape[0],
        move_hidden=move_sd["main.0.weight"].shape[0],
        move_out=move_sd["main.3.weight"].shape[0],
        motion_hidden=mot_sd["input_emb.weight"].shape[0],
        output_size=out_size)
    evaluator.text_params = convert_t2m_textencoder(text_sd)
    evaluator.move_params = convert_t2m_movementencoder(move_sd)
    evaluator.motion_params = convert_t2m_motionencoder(mot_sd)
    evaluator.is_pretrained = True

    # tokenized ONCE and fed to both text encoders: word-vector parity has
    # its own genuine-module test (tests/test_parity_reference.py)
    words, pos, lens = [], [], []
    for c in captions:
        w, p, ln = evaluator.vectorizer.tokens_to_arrays(
            c.split(), evaluator.max_text_len)
        words.append(w); pos.append(p); lens.append(ln)
    words = np.stack(words); pos = np.stack(pos)
    lens = np.asarray(lens, np.int64)

    # the torch-side shuffle (tm2t.py:89 torch.randperm under manual_seed),
    # replayed into our deterministic hook
    torch.manual_seed(0)
    perm = torch.randperm(n)

    tm2t_j = TM2TMetrics(R_size=8, diversity_times=4,
                         shuffle_idx=perm.numpy())
    tm2t_j.update(
        np.asarray(evaluator._embed_text(
            jnp.asarray(words), jnp.asarray(pos), jnp.asarray(lens))),
        evaluator.embed_motion(feats_rst_j, lengths),
        evaluator.embed_motion(gt, lengths),
    )
    from seeme_tpu.core.ric import recover_from_ric as ric_j

    joints_rst_j = np.asarray(ric_j(jnp.asarray(feats_rst_j), joints_num))
    joints_ref_j = np.asarray(ric_j(jnp.asarray(gt), joints_num))
    mr_j = MRMetrics()
    mr_j.update(joints_rst_j, joints_ref_j, lengths)
    metrics_j = {**mr_j.compute(), **tm2t_j.compute()}

    # ==================================================== torch genuine side
    ablation = SimpleNamespace(MLP_DIST=False, PE_TYPE="mld",
                               SKIP_CONNECT=True, VAE_TYPE="mld",
                               DIFF_PE_TYPE="mld", MD_TRANS=False)
    tvae = ref_vae.MldVae(ablation, nfeats=nfeats,
                          latent_dim=[latent_size, d],
                          arch="encoder_decoder",
                          position_embedding="learned").eval()
    tvae.load_state_dict(
        {k[len("vae."):]: v for k, v in mld_sd.items()
         if k.startswith("vae.")})
    tden = ref_den.MldDenoiser(
        ablation, condition="text", latent_dim=[latent_size, d],
        ff_size=ff, num_layers=num_layers, num_heads=1,
        text_encoded_dim=text_dim, arch="trans_enc",
        position_embedding="learned").eval()
    tden.load_state_dict(den_sd)

    from seeme_tpu.diffusion.schedulers import DiffusionSchedule
    from seeme_tpu.ops.denoiser_fused import ddim_schedule_arrays

    tsa, acp_t, acp_prev = (np.asarray(a) for a in ddim_schedule_arrays(
        DiffusionSchedule(), steps))
    z = torch.from_numpy(z0)                       # init_noise_sigma == 1.0
    cond2 = torch.from_numpy(
        np.concatenate([np.zeros_like(text_emb), text_emb], axis=0)
    ).permute(1, 0, 2)                             # token-first (1, 2n, td)
    with torch.no_grad():
        for i in range(steps):
            (pred,) = tden(torch.cat([z, z], dim=0),
                           torch.tensor(int(tsa[i])), cond2)
            eps = pred[:n] + guidance * (pred[n:] - pred[:n])
            x0 = (z - np.sqrt(1.0 - acp_t[i]) * eps) / np.sqrt(acp_t[i])
            z = np.sqrt(acp_prev[i]) * x0 + np.sqrt(1.0 - acp_prev[i]) * eps
        feats_rst_t = tvae.decode(z.permute(1, 0, 2), list(lengths))

        t_text = ref_tenc.TextEncoderBiGRUCo(
            word_size, pos_size, text_sd["input_emb.weight"].shape[0],
            out_size).eval()
        t_text.load_state_dict(text_sd)
        t_move = ref_menc.MovementConvEncoder(
            move_in, move_sd["main.0.weight"].shape[0],
            move_sd["main.3.weight"].shape[0]).eval()
        t_move.load_state_dict(move_sd)
        t_mot = ref_menc.MotionEncoderBiGRUCo(
            move_sd["main.3.weight"].shape[0],
            mot_sd["input_emb.weight"].shape[0], out_size).eval()
        t_mot.load_state_dict(mot_sd)

        lat_t = t_text(torch.from_numpy(words), torch.from_numpy(pos),
                       torch.from_numpy(lens))
        m_lens = torch.from_numpy(lengths) // 4
        lat_rm = t_mot(t_move(feats_rst_t[..., :-4]), m_lens)
        lat_m = t_mot(t_move(torch.from_numpy(gt)[..., :-4]), m_lens)

        tm2t_t = ref_tm2t.TM2TMetrics(top_k=3, R_size=8, diversity_times=4)
        tm2t_t.update(lat_t, lat_rm, lat_m, list(lengths))
        torch.manual_seed(0)                       # compute() re-draws perm
        metrics_t = {k: float(v) for k, v in
                     tm2t_t.compute(sanity_flag=False).items()}

        j_rst_t = ref_mp.recover_from_ric(feats_rst_t.float(), joints_num)
        j_ref_t = ref_mp.recover_from_ric(
            torch.from_numpy(gt).float(), joints_num)
        mr_t = ref_mr.MRMetrics(njoints=joints_num, jointstype="humanml3d")
        mr_t.update(j_rst_t, j_ref_t, list(lengths))
        metrics_t.update({k: float(v) for k, v in
                          mr_t.compute(sanity_flag=False).items()})

    end_to_end_t2m.last = (metrics_j, metrics_t)  # debug/inspection hook
    # ---- compare everything both sides report, Diversity excluded
    compare = [k for k in metrics_t
               if k in metrics_j and "Diversity" not in k]
    deltas = {}
    for k in compare:
        ref_v, j_v = metrics_t[k], metrics_j[k]
        deltas[k] = abs(j_v - ref_v) / max(abs(ref_v), 1.0)
    worst = max(deltas, key=deltas.get)
    detail = (f"{len(compare)} metrics compared on n={n} seqs, "
              f"worst {worst}: ours={metrics_j[worst]:.5f} "
              f"ref={metrics_t[worst]:.5f}")
    return deltas[worst], detail


@dataclass
class CkptSpec:
    name: str
    pattern: str                         # glob under deps/
    kind: str                            # convert_checkpoint --kind
    parity: Callable[[Dict], tuple]
    note: str = ""


def _ckpt_specs(ctx: Ctx) -> List[CkptSpec]:
    d = ctx.deps
    return [
        CkptSpec("MLD checkpoint (vae+denoiser)",
                 os.path.join(d, "checkpoints_mld", "*.ckpt"),
                 "mld", parity_mld,
                 "place released epoch=*.ckpt under deps/checkpoints_mld/"),
        CkptSpec("ProHMR-Scene best_model.pt",
                 os.path.join(d, "checkpoints_egohmr", "**", "best_model.pt"),
                 "prohmr", parity_prohmr,
                 "frozen perception stack (mld.py:185-208)"),
        CkptSpec("EgoHMR best_model_mpjpe_vis.pt",
                 os.path.join(d, "checkpoints_egohmr", "**",
                              "best_model_mpjpe_vis.pt"),
                 "egohmr", parity_egohmr,
                 "diffusion-GCN branch (mld.py:235-246)"),
        CkptSpec("t2m text encoder (text_mot_match finest.tar)",
                 os.path.join(d, "t2m", "**", "text_mot_match", "**",
                              "finest.tar"),
                 "t2m_text", lambda sd: parity_t2m(
                     _sub_sd(sd, "text_encoder."), "text")),
        CkptSpec("t2m motion encoder",
                 os.path.join(d, "t2m", "**", "text_mot_match", "**",
                              "finest.tar"),
                 "t2m_motion", lambda sd: parity_t2m(
                     _sub_sd(sd, "motion_encoder."), "motion")),
        CkptSpec("t2m movement encoder",
                 os.path.join(d, "t2m", "**", "text_mot_match", "**",
                              "finest.tar"),
                 "t2m_move", lambda sd: parity_t2m(
                     _sub_sd(sd, "movement_encoder."), "move")),
        CkptSpec("humanact12_gru.tar",
                 os.path.join(d, "actionrecognition", "humanact12_gru.tar"),
                 "a2m_gru", parity_a2m_gru,
                 "point TEST.EVALUATOR_CHECKPOINT at the converted result"),
        CkptSpec("uestc_rot6d_stgcn.tar",
                 os.path.join(d, "actionrecognition",
                              "uestc_rot6d_stgcn.tar"),
                 "uestc_stgcn", parity_uestc_stgcn),
    ]


def _sub_sd(sd: Dict, prefix: str) -> Dict:
    """Resolve a nested / prefixed / bare evaluator state dict — delegates
    to the converter's `_t2m_sub` so both tools accept the same layouts."""
    from convert_checkpoint import _t2m_sub

    return _t2m_sub(sd, prefix.rstrip("."))


# --------------------------------------------------------------------------
# checks
# --------------------------------------------------------------------------

def check_smpl(ctx: Ctx) -> None:
    base = os.path.join(ctx.deps, "smpl_models", "smpl")
    for gender in ("NEUTRAL", "MALE", "FEMALE"):
        p = os.path.join(base, f"SMPL_{gender}.pkl")
        if not os.path.exists(p):
            ctx.rows.append(Row(f"SMPL_{gender}.pkl", "MISSING",
                                action=f"place at {p}"))
            continue
        try:
            import jax.numpy as jnp

            from seeme_tpu.core import load_smpl
            from seeme_tpu.core.smpl import smpl_joints24

            m = load_smpl(p)
            j = smpl_joints24(m, jnp.zeros((1, 10)), jnp.zeros((1, 69)),
                              jnp.zeros((1, 3)))
            ok = bool(jnp.isfinite(j).all())
            ctx.rows.append(Row(
                f"SMPL_{gender}.pkl", "PARITY-OK" if ok else "PARITY-FAIL",
                f"{m.v_template.shape[0]} verts, FK finite={ok}"))
        except Exception as e:  # noqa: BLE001 — report, don't crash the scan
            ctx.rows.append(Row(f"SMPL_{gender}.pkl", "ERROR",
                                f"{type(e).__name__}: {e}"))

    p = os.path.join(ctx.deps, "smpl_mean_params.npz")
    if os.path.exists(p):
        import numpy as np

        keys = set(np.load(p).keys())
        ok = {"shape", "cam"} <= keys or {"pose", "shape"} <= keys
        ctx.rows.append(Row("smpl_mean_params.npz",
                            "FOUND" if ok else "ERROR", f"keys={sorted(keys)}"))
    else:
        ctx.rows.append(Row("smpl_mean_params.npz", "MISSING",
                            action=f"place at {p}"))


def check_clip(ctx: Ctx) -> None:
    p = os.path.join(ctx.deps, "clip-vit-large-patch14")
    if not os.path.isdir(p):
        ctx.rows.append(Row("clip-vit-large-patch14", "MISSING",
                            action=f"HF snapshot at {p}"))
        return
    has_cfg = os.path.exists(os.path.join(p, "config.json"))
    weights = glob.glob(os.path.join(p, "*.bin")) + glob.glob(
        os.path.join(p, "*.safetensors"))
    ctx.rows.append(Row(
        "clip-vit-large-patch14", "FOUND" if has_cfg and weights else "ERROR",
        f"config={has_cfg} weights={len(weights)}",
        "" if has_cfg and weights else "snapshot incomplete"))


def check_glove(ctx: Ctx) -> None:
    p = os.path.join(ctx.deps, "glove")
    found = glob.glob(os.path.join(p, "our_vab_*"))
    ctx.rows.append(Row(
        "GloVe (our_vab_*)", "FOUND" if found else "MISSING",
        f"{len(found)} files" if found else "",
        "" if found else f"place our_vab_data/idx/words at {p}"))


def check_datasets(ctx: Ctx) -> None:
    d = ctx.datasets
    specs = [
        ("EgoBody", os.path.join(d, "EgoBody", "raw"),
         "python tools/preprocess_egobody.py --root datasets/EgoBody"),
        ("GIMO", os.path.join(d, "GIMO", "raw"),
         "python tools/preprocess_egobody.py --root datasets/GIMO "
         "--pose-dims 63"),
        ("HumanML3D", os.path.join(d, "HumanML3D", "new_joint_vecs"), ""),
        ("KIT-ML", os.path.join(d, "KIT-ML", "new_joint_vecs"), ""),
        ("HumanAct12", os.path.join(d, "HumanAct12",
                                    "humanact12poses.pkl"), ""),
        ("UESTC (VIBE cache)", os.path.join(d, "uestc", "vibe_cache"), ""),
    ]
    for name, path, prep in specs:
        if os.path.exists(path):
            # processed shards present? (EgoBody/GIMO need the preprocessor)
            if name in ("EgoBody", "GIMO"):
                proc = glob.glob(os.path.join(os.path.dirname(path),
                                              "our_process_smpl*", "*.npy"))
                if proc:
                    ctx.rows.append(Row(f"dataset {name}", "FOUND",
                                        f"{len(proc)} processed shards"))
                else:
                    ctx.rows.append(Row(f"dataset {name}", "FOUND",
                                        "raw only", f"run: {prep}"))
            else:
                ctx.rows.append(Row(f"dataset {name}", "FOUND"))
        else:
            ctx.rows.append(Row(f"dataset {name}", "MISSING",
                                action=f"place release at {path}"
                                + (f"; then {prep}" if prep else "")))


def check_end_to_end(ctx: Ctx) -> None:
    """--end-to-end: composed metric-level parity on the t2m chain (needs
    the MLD humanml checkpoint + the text_mot_match evaluator trio)."""
    mld_hits = sorted(glob.glob(
        os.path.join(ctx.deps, "checkpoints_mld", "*.ckpt")))
    t2m_hits = sorted(glob.glob(
        os.path.join(ctx.deps, "t2m", "**", "text_mot_match", "**",
                     "finest.tar"), recursive=True))
    if not mld_hits or not t2m_hits:
        ctx.rows.append(Row(
            "end-to-end t2m metrics", "MISSING",
            action="needs deps/checkpoints_mld/*.ckpt + "
                   "deps/t2m/**/text_mot_match/**/finest.tar"))
        return
    if not reference_available():
        ctx.rows.append(Row("end-to-end t2m metrics", "MISSING",
                            "/root/reference absent"))
        return
    try:
        err, detail = end_to_end_t2m(_load_sd(mld_hits[0]),
                                     _load_sd(t2m_hits[0]))
        if err != err:  # NaN: skipped with a reason in detail
            ctx.rows.append(Row("end-to-end t2m metrics", "FOUND", detail))
            return
        # relative metric deltas: generation + embeddings + metric math
        # compose ~1e-5 forward errors; 1e-3 catches any real conversion slip
        status = "PARITY-OK" if err < 1e-3 else "PARITY-FAIL"
        ctx.rows.append(Row("end-to-end t2m metrics", status,
                            f"max_rel_delta={err:.2e} {detail}"))
    except Exception as e:  # noqa: BLE001 — report, don't crash the scan
        ctx.rows.append(Row("end-to-end t2m metrics", "ERROR",
                            f"{type(e).__name__}: {e}"))


def check_checkpoints(ctx: Ctx) -> None:
    if not reference_available():
        ctx.rows.append(Row("reference tree", "MISSING",
                            "/root/reference absent — parity checks skipped"))
    for spec in _ckpt_specs(ctx):
        hits = sorted(glob.glob(spec.pattern, recursive=True))
        if not hits:
            ctx.rows.append(Row(spec.name, "MISSING",
                                action=f"expected {spec.pattern}"
                                + (f" ({spec.note})" if spec.note else "")))
            continue
        src = hits[0]
        status, detail = "FOUND", os.path.relpath(src)
        if ctx.do_convert or ctx.do_parity:
            try:
                sd = _load_sd(src)
                if ctx.do_parity and reference_available():
                    err, pdetail = spec.parity(sd)
                    tol = 5e-3
                    status = "PARITY-OK" if err < tol else "PARITY-FAIL"
                    detail = f"max_err={err:.2e} {pdetail}"
                if ctx.do_convert:
                    import subprocess

                    dst = os.path.join(ctx.out, spec.kind)
                    r = subprocess.run(
                        [sys.executable, "tools/convert_checkpoint.py",
                         "--kind", spec.kind, "--src", src, "--dst", dst],
                        capture_output=True, text=True)
                    if r.returncode != 0:
                        status, detail = "ERROR", r.stderr.strip()[-300:]
                    elif status == "FOUND":
                        status = "CONVERTED"
                        detail += f" -> {dst}"
            except Exception as e:  # noqa: BLE001
                status, detail = "ERROR", f"{type(e).__name__}: {e}"
        ctx.rows.append(Row(spec.name, status, detail))


def print_table(rows: List[Row]) -> int:
    w_asset = max(len(r.asset) for r in rows) + 2
    w_status = max(len(r.status) for r in rows) + 2
    print(f"{'asset':<{w_asset}}{'status':<{w_status}}detail / next action")
    print("-" * (w_asset + w_status + 40))
    n_bad = 0
    for r in rows:
        extra = r.detail + (f"  [{r.action}]" if r.action else "")
        print(f"{r.asset:<{w_asset}}{r.status:<{w_status}}{extra}")
        if r.status in ("PARITY-FAIL", "ERROR"):
            n_bad += 1
    missing = sum(r.status == "MISSING" for r in rows)
    ok = sum(r.status in ("PARITY-OK", "CONVERTED", "FOUND") for r in rows)
    print("-" * (w_asset + w_status + 40))
    print(f"{ok} ready, {missing} missing, {n_bad} failing")
    if missing == 0 and n_bad == 0:
        print("\nall assets ready — quality-parity protocol (BASELINE.md):")
        print("  python test.py --cfg configs/config_mld_egobody.yaml "
              "--replication_times 20")
    return 1 if n_bad else 0


def main(argv: Optional[List[str]] = None) -> int:
    # pure host work; pin CPU before anything can touch the TPU relay
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--deps", default="deps")
    ap.add_argument("--datasets", default="datasets")
    ap.add_argument("--out", default=None,
                    help="converted-checkpoint dir (default <deps>/converted)")
    ap.add_argument("--scan", action="store_true",
                    help="presence scan only: no conversion, no parity")
    ap.add_argument("--end-to-end", action="store_true",
                    help="also run composed metric-level parity on the t2m "
                         "chain (generation -> evaluator -> metric values)")
    args = ap.parse_args(argv)

    ctx = Ctx(deps=args.deps, datasets=args.datasets,
              out=args.out or os.path.join(args.deps, "converted"),
              do_convert=not args.scan, do_parity=not args.scan)

    check_smpl(ctx)
    check_clip(ctx)
    check_glove(ctx)
    check_datasets(ctx)
    check_checkpoints(ctx)
    if args.end_to_end:
        check_end_to_end(ctx)
    return print_table(ctx.rows)


if __name__ == "__main__":
    sys.exit(main())
