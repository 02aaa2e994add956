"""tools/preflight.py end-to-end: fabricate every checkpoint asset in its
released on-disk format (genuine reference modules, random weights), run the
one-command scan→convert→parity flow, and assert the table reports
PARITY-OK / CONVERTED for all of them.

This is the proof that "the day real assets land, quality parity is one
command away": the fabricated files exercise the same loaders, converters,
and genuine-module forward comparisons real releases will."""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tools")

import preflight  # noqa: E402

pytestmark = pytest.mark.slow

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def asset_tree(tmp_path_factory):
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree unavailable")
    root = tmp_path_factory.mktemp("assets")
    deps = root / "deps"
    datasets = root / "datasets"
    torch.manual_seed(0)

    # ---- SMPL pkl (MPI file contract: v_template/shapedirs/posedirs/
    # J_regressor/weights/kintree_table/f)
    from seeme_tpu.core.smpl import PARENTS

    V = 128
    rng = np.random.RandomState(0)
    jr = np.abs(rng.randn(24, V)).astype(np.float64)
    jr /= jr.sum(1, keepdims=True)
    w = np.abs(rng.randn(V, 24)).astype(np.float64)
    w /= w.sum(1, keepdims=True)
    kintree = np.stack([np.asarray(PARENTS, np.int64) % (1 << 32),
                        np.arange(24, dtype=np.int64)])
    smpl_dir = deps / "smpl_models" / "smpl"
    smpl_dir.mkdir(parents=True)
    for gender in ("NEUTRAL", "MALE", "FEMALE"):
        with open(smpl_dir / f"SMPL_{gender}.pkl", "wb") as f:
            pickle.dump({
                "v_template": rng.randn(V, 3) * 0.3,
                "shapedirs": rng.randn(V, 3, 10) * 0.01,
                "posedirs": rng.randn(V, 3, 207) * 0.001,
                "J_regressor": jr,
                "weights": w,
                "kintree_table": kintree,
                "f": np.stack([np.arange(V - 2), np.arange(1, V - 1),
                               np.arange(2, V)], 1),
            }, f)
    np.savez(deps / "smpl_mean_params.npz",
             shape=np.zeros(10, np.float32),
             cam=np.array([0.9, 0.0, 0.0], np.float32),
             pose=np.zeros(144, np.float32))

    # ---- MLD checkpoint (Lightning layout: vae.* + denoiser.* under
    # 'state_dict'), genuine modules at small-but-flagship-shaped dims
    preflight._install_ref_stubs()
    from types import SimpleNamespace

    mld_vae = preflight._import_ref("mld.models.architectures.mld_vae")
    mld_den = preflight._import_ref("mld.models.architectures.mld_denoiser")
    ablation = SimpleNamespace(MLP_DIST=False, PE_TYPE="mld",
                               SKIP_CONNECT=True, VAE_TYPE="mld",
                               DIFF_PE_TYPE="mld", MD_TRANS=True)
    tvae = mld_vae.MldVae(ablation, nfeats=11, latent_dim=[1, 32],
                          arch="encoder_decoder",
                          position_embedding="learned").eval()
    tden = mld_den.MldDenoiser(
        ablation, condition="text", latent_dim=[1, 32], ff_size=48,
        num_layers=3, num_heads=4, text_encoded_dim=16,
        arch="trans_enc", position_embedding="learned").eval()
    with torch.no_grad():  # zero-init linears would mask conversion bugs
        for p in tden.parameters():
            if p.numel() and p.abs().max() == 0:
                p.normal_(0, 0.05)
    sd = {f"vae.{k}": v for k, v in tvae.state_dict().items()}
    sd.update({f"denoiser.{k}": v for k, v in tden.state_dict().items()})
    (deps / "checkpoints_mld").mkdir(parents=True)
    torch.save({"state_dict": sd}, deps / "checkpoints_mld" / "epoch=9.ckpt")

    # ---- ProHMR best_model.pt: backbone.* + scene_enc.* + flow.flow.*
    ref_resnet = preflight._import_ref("EgoHMR.models.resnet")
    ref_pointnet = preflight._import_ref("EgoHMR.models.respointnet")
    ref_glow = preflight._import_ref("nflows.flows.glow")
    tnet = ref_resnet.ResNet(ref_resnet.Bottleneck, [3, 4, 6, 3]).eval()
    tpn = ref_pointnet.ResnetPointnet(out_dim=8, hidden_dim=16).eval()
    g = ref_glow.ConditionalGlow(features=6, hidden_features=16,
                                 num_layers=2, num_blocks_per_layer=2,
                                 context_features=5)
    g.train()
    g.log_prob(torch.randn(32, 6), context=torch.randn(32, 5))  # ActNorm init
    g.eval()
    sd = {f"backbone.{k}": v for k, v in tnet.state_dict().items()}
    sd.update({f"scene_enc.{k}": v for k, v in tpn.state_dict().items()})
    sd.update({f"flow.flow.{k}": v for k, v in g.state_dict().items()})
    fc = torch.nn.Sequential(torch.nn.Linear(5, 16), torch.nn.ReLU(),
                             torch.nn.Linear(16, 13))
    sd.update({f"flow.fc_head.layers.{i}.{k}": v
               for i in (0, 2) for k, v in fc[i].state_dict().items()})
    sd["smpl.v_template"] = torch.zeros(3)  # must be filtered, mld.py:196
    d = deps / "checkpoints_egohmr" / "53618"
    d.mkdir(parents=True)
    torch.save({"state_dict": sd}, d / "best_model.pt")

    # ---- EgoHMR best_model_mpjpe_vis.pt: backbone/scene_enc/transl_enc/
    # embed_timestep/input_process/diffusion_model/beta_layer
    ref_gcn = preflight._import_ref(
        "EgoHMR.models.egohmr.modulated_gcn.modulated_gcn")
    from seeme_tpu.nn.gcn import smpl_adjacency

    gcn_in = 2048 + 8 + 12 + 6 + 64 + 32  # arbitrary consistent in_dim
    tgcn = ref_gcn.ModulatedGCN(torch.tensor(np.asarray(smpl_adjacency())),
                                in_dim=gcn_in, out_dim=6, hid_dim=32,
                                num_layers=2).eval()
    sd = {f"backbone.{k}": v for k, v in tnet.state_dict().items()}
    sd.update({f"scene_enc.{k}": v for k, v in tpn.state_dict().items()})
    sd.update({f"diffusion_model.{k}": v for k, v in tgcn.state_dict().items()})
    lin = torch.nn.Sequential(torch.nn.Linear(3, 16), torch.nn.ReLU(),
                              torch.nn.Linear(16, 12))
    sd.update({f"transl_enc.layers.{i}.{k}": v
               for i in (0, 2) for k, v in lin[i].state_dict().items()})
    temb = torch.nn.Sequential(torch.nn.Linear(64, 64), torch.nn.SiLU(),
                               torch.nn.Linear(64, 64))
    sd.update({f"embed_timestep.time_embed.{i}.{k}": v
               for i in (0, 2) for k, v in temb[i].state_dict().items()})
    pe = torch.nn.Linear(6, 32)
    sd.update({f"input_process.poseEmbedding.{k}": v
               for k, v in pe.state_dict().items()})
    beta = torch.nn.Sequential(torch.nn.Linear(20, 24), torch.nn.ReLU(),
                               torch.nn.Linear(24, 10))
    sd.update({f"beta_layer.layers.{i}.{k}": v
               for i in (0, 2) for k, v in beta[i].state_dict().items()})
    torch.save({"state_dict": sd}, d / "best_model_mpjpe_vis.pt")

    # ---- t2m finest.tar (nested encoder dicts, the released layout)
    t2m_text = preflight._import_ref("mld.models.architectures.t2m_textenc")
    t2m_motion = preflight._import_ref(
        "mld.models.architectures.t2m_motionenc")
    tten = t2m_text.TextEncoderBiGRUCo(30, 15, 32, 32).eval()
    tmov = t2m_motion.MovementConvEncoder(20, 32, 32).eval()
    tmot = t2m_motion.MotionEncoderBiGRUCo(32, 48, 32).eval()
    tdir = deps / "t2m" / "t2m" / "text_mot_match" / "model"
    tdir.mkdir(parents=True)
    torch.save({"text_encoder": tten.state_dict(),
                "movement_encoder": tmov.state_dict(),
                "motion_encoder": tmot.state_dict()}, tdir / "finest.tar")

    # ---- action evaluators
    gru_mod = preflight._import_ref(
        "mld.models.architectures.humanact12_gru")
    tcls = gru_mod.MotionDiscriminator(18, 24, 2, output_size=12).eval()
    (deps / "actionrecognition").mkdir(parents=True)
    torch.save(tcls.state_dict(),
               deps / "actionrecognition" / "humanact12_gru.tar")

    stgcn_mod = preflight._import_ref(
        "mld.models.architectures.uestc_stgcn")
    kt_path = root / "kintree_table.pkl"
    with open(kt_path, "wb") as f:
        pickle.dump(np.stack([np.asarray(PARENTS, np.int64),
                              np.arange(24, dtype=np.int64)]), f)
    tst = stgcn_mod.STGCN(in_channels=6, num_class=40,
                          kintree_path=str(kt_path),
                          graph_args={"layout": "smpl",
                                      "strategy": "spatial"},
                          edge_importance_weighting=True).eval()
    with torch.no_grad():  # randomize BN stats so their conversion is tested
        for m in tst.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    torch.save(tst.state_dict(),
               deps / "actionrecognition" / "uestc_rot6d_stgcn.tar")

    datasets.mkdir()
    return root


def test_preflight_full_flow(asset_tree, capsys):
    rc = preflight.main([
        "--deps", str(asset_tree / "deps"),
        "--datasets", str(asset_tree / "datasets"),
    ])
    out = capsys.readouterr().out
    print(out)
    assert rc == 0, out

    # every fabricated checkpoint converts AND passes real-weight parity
    for name in ("MLD checkpoint", "ProHMR-Scene", "EgoHMR best_model",
                 "t2m text", "t2m motion", "t2m movement",
                 "humanact12_gru", "uestc_rot6d_stgcn"):
        line = next(ln for ln in out.splitlines() if ln.startswith(name))
        assert "PARITY-OK" in line, line
    for gender in ("NEUTRAL", "MALE", "FEMALE"):
        line = next(ln for ln in out.splitlines()
                    if ln.startswith(f"SMPL_{gender}"))
        assert "PARITY-OK" in line, line

    # converted orbax checkpoints exist where test.py expects them
    conv = asset_tree / "deps" / "converted"
    for kind in ("mld", "prohmr", "egohmr", "t2m_text", "t2m_motion",
                 "t2m_move", "a2m_gru", "uestc_stgcn"):
        assert (conv / kind).is_dir(), kind

    # datasets are reported missing with actionable next steps
    assert "dataset EgoBody" in out and "preprocess_egobody" in out


def test_preflight_scan_only_reports_missing(tmp_path, capsys):
    rc = preflight.main(["--scan", "--deps", str(tmp_path / "deps"),
                         "--datasets", str(tmp_path / "datasets")])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("MISSING") >= 15


@pytest.fixture(scope="module")
def e2e_assets(tmp_path_factory):
    """A dims-CONSISTENT mld + t2m evaluator pair for the composed
    end-to-end metric parity (--end-to-end): nfeats must be a RIC layout
    (12j-1), the denoiser md_trans=False (the t2m chain), the movement
    encoder input nfeats-4, and the text encoder at the GloVe 300/15
    contract. The module-parity fixture above intentionally varies dims per
    family, so it cannot serve this composed check."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree unavailable")
    from types import SimpleNamespace

    root = tmp_path_factory.mktemp("e2e_assets")
    deps = root / "deps"
    torch.manual_seed(3)
    nfeats = 47                       # 12*4 - 1: j=4 RIC layout

    mld_vae = preflight._import_ref("mld.models.architectures.mld_vae")
    mld_den = preflight._import_ref("mld.models.architectures.mld_denoiser")
    ablation = SimpleNamespace(MLP_DIST=False, PE_TYPE="mld",
                               SKIP_CONNECT=True, VAE_TYPE="mld",
                               DIFF_PE_TYPE="mld", MD_TRANS=False)
    tvae = mld_vae.MldVae(ablation, nfeats=nfeats, latent_dim=[1, 32],
                          arch="encoder_decoder",
                          position_embedding="learned").eval()
    tden = mld_den.MldDenoiser(
        ablation, condition="text", latent_dim=[1, 32], ff_size=48,
        num_layers=3, num_heads=1, text_encoded_dim=16,
        arch="trans_enc", position_embedding="learned").eval()
    with torch.no_grad():
        for p in tden.parameters():
            if p.numel() and p.abs().max() == 0:
                p.normal_(0, 0.05)
    sd = {f"vae.{k}": v for k, v in tvae.state_dict().items()}
    sd.update({f"denoiser.{k}": v for k, v in tden.state_dict().items()})
    (deps / "checkpoints_mld").mkdir(parents=True)
    torch.save({"state_dict": sd}, deps / "checkpoints_mld" / "epoch=9.ckpt")

    t2m_text = preflight._import_ref("mld.models.architectures.t2m_textenc")
    t2m_motion = preflight._import_ref(
        "mld.models.architectures.t2m_motionenc")
    tten = t2m_text.TextEncoderBiGRUCo(300, 15, 48, 32).eval()
    tmov = t2m_motion.MovementConvEncoder(nfeats - 4, 48, 32).eval()
    tmot = t2m_motion.MotionEncoderBiGRUCo(32, 48, 32).eval()
    tdir = deps / "t2m" / "t2m" / "text_mot_match" / "model"
    tdir.mkdir(parents=True)
    torch.save({"text_encoder": tten.state_dict(),
                "movement_encoder": tmov.state_dict(),
                "motion_encoder": tmot.state_dict()}, tdir / "finest.tar")
    return deps


def test_preflight_end_to_end_metric_parity(e2e_assets):
    """Composed generation -> evaluator -> metric-value parity: converted
    weights through T2MSystem + our metric stack vs the genuine torch chain
    + the genuine TM2TMetrics/MRMetrics (VERDICT r4 next #7)."""
    mld_sd = preflight._load_sd(
        str(e2e_assets / "checkpoints_mld" / "epoch=9.ckpt"))
    t2m_sd = preflight._load_sd(str(
        e2e_assets / "t2m" / "t2m" / "text_mot_match" / "model" /
        "finest.tar"))
    err, detail = preflight.end_to_end_t2m(mld_sd, t2m_sd)
    assert err == err, f"skipped: {detail}"
    assert err < 1e-3, (err, detail)


def test_preflight_end_to_end_flag(e2e_assets, capsys):
    """--end-to-end adds the composed row to the table."""
    rc = preflight.main([
        "--deps", str(e2e_assets), "--datasets",
        str(e2e_assets / "nonexistent_datasets"), "--end-to-end",
    ])
    out = capsys.readouterr().out
    line = next(ln for ln in out.splitlines()
                if ln.startswith("end-to-end t2m metrics"))
    assert "PARITY-OK" in line, (rc, line)
