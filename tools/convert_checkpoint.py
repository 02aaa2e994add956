#!/usr/bin/env python
"""torch -> seeme_tpu checkpoint conversion.

Covers the four checkpoint families the reference loads (SURVEY.md
hard-parts #4), with their key-filtering conventions:

  * MLD Lightning checkpoints (vae + denoiser): stage-2 strips the `vae.`
    prefix for the strict VAE load (`train.py:155-167`); the text-encoder
    weights are absent by construction (`modeltype/base.py:124-132`).
  * ProHMR `best_model.pt`: `smpl.*` keys dropped (`mld.py:196-203`);
    backbone / scene_enc / flow / fc_head / discriminator.
  * EgoHMR `best_model_mpjpe_vis.pt`: same filtering.
  * t2m evaluator checkpoints (text/movement/motion encoders).

Usage:
  python tools/convert_checkpoint.py --kind mld --src epoch=5999.ckpt \
      --dst converted/ [--cfg configs/config_mld_egobody.yaml]

The module-level `convert_*` functions are pure dict -> dict maps usable as a
library (the parity tests build torch modules and compare outputs).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict

import numpy as np

# running as `python tools/convert_checkpoint.py` puts tools/ (not the repo
# root) on sys.path; the save step imports seeme_tpu
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_linear(sd: Dict, prefix: str) -> Dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_layernorm(sd: Dict, prefix: str) -> Dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def convert_mha(sd: Dict, prefix: str) -> Dict:
    """torch.nn.MultiheadAttention -> our MultiHeadAttention: the packed
    in_proj (3D, D) splits into q/k/v projections."""
    w = _t(sd[f"{prefix}.in_proj_weight"])
    b = _t(sd[f"{prefix}.in_proj_bias"])
    D = w.shape[1]
    return {
        "q_proj": {"kernel": w[:D].T, "bias": b[:D]},
        "k_proj": {"kernel": w[D : 2 * D].T, "bias": b[D : 2 * D]},
        "v_proj": {"kernel": w[2 * D :].T, "bias": b[2 * D :]},
        "out_proj": convert_linear(sd, f"{prefix}.out_proj"),
    }


def convert_encoder_layer(sd: Dict, prefix: str) -> Dict:
    """TransformerEncoderLayer (`cross_attention.py:258-316`)."""
    return {
        "self_attn": convert_mha(sd, f"{prefix}.self_attn"),
        "linear1": convert_linear(sd, f"{prefix}.linear1"),
        "linear2": convert_linear(sd, f"{prefix}.linear2"),
        "norm1": convert_layernorm(sd, f"{prefix}.norm1"),
        "norm2": convert_layernorm(sd, f"{prefix}.norm2"),
    }


def convert_decoder_layer(sd: Dict, prefix: str) -> Dict:
    return {
        "self_attn": convert_mha(sd, f"{prefix}.self_attn"),
        "multihead_attn": convert_mha(sd, f"{prefix}.multihead_attn"),
        "linear1": convert_linear(sd, f"{prefix}.linear1"),
        "linear2": convert_linear(sd, f"{prefix}.linear2"),
        "norm1": convert_layernorm(sd, f"{prefix}.norm1"),
        "norm2": convert_layernorm(sd, f"{prefix}.norm2"),
        "norm3": convert_layernorm(sd, f"{prefix}.norm3"),
    }


def convert_skip_transformer(sd: Dict, prefix: str, num_layers: int,
                             decoder: bool = False) -> Dict:
    """SkipTransformerEncoder/Decoder (`cross_attention.py:18-147`)."""
    n_block = (num_layers - 1) // 2
    conv = convert_decoder_layer if decoder else convert_encoder_layer
    out: Dict = {}
    for i in range(n_block):
        out[f"input_{i}"] = conv(sd, f"{prefix}.input_blocks.{i}")
        out[f"output_{i}"] = conv(sd, f"{prefix}.output_blocks.{i}")
        out[f"skip_linear_{i}"] = convert_linear(sd, f"{prefix}.linear_blocks.{i}")
    out["middle"] = conv(sd, f"{prefix}.middle_block")
    out["norm"] = convert_layernorm(sd, f"{prefix}.norm")
    return out


def convert_learned_pe(sd: Dict, prefix: str) -> Dict:
    """PositionEmbeddingLearned1D: (max_len, 1, d) buffer -> (max_len, d)."""
    return {"pe": _t(sd[f"{prefix}.pe"])[:, 0, :]}


def convert_motion_vae(sd: Dict, num_layers: int = 5,
                       arch: str = "encoder_decoder") -> Dict:
    """MldVae state dict (keys already stripped of any `vae.` prefix).
    arch='all_encoder' decoders are SkipTransformerEncoder stacks
    (`mld_vae.py:88-92`) — plain encoder-layer key layout."""
    params = {
        "global_motion_token": _t(sd["global_motion_token"]),
        "skel_embedding": convert_linear(sd, "skel_embedding"),
        "final_layer": convert_linear(sd, "final_layer"),
        "query_pos_encoder": convert_learned_pe(sd, "query_pos_encoder"),
        "query_pos_decoder": convert_learned_pe(sd, "query_pos_decoder"),
        "encoder": convert_skip_transformer(sd, "encoder", num_layers),
        "decoder": convert_skip_transformer(
            sd, "decoder", num_layers,
            decoder=(arch == "encoder_decoder")),
    }
    if "dist_layer.weight" in sd:  # MLP_DIST=True (`mld_vae.py:107-110`)
        params["dist_layer"] = convert_linear(sd, "dist_layer")
    return {"params": params}


def convert_stylization_block(sd: Dict, prefix: str) -> Dict:
    """StylizationBlock (`mdiff_transformer.py:137-163`): emb_layers is
    Sequential(SiLU, Linear) and out_layers Sequential(SiLU, Dropout, Linear)."""
    return {
        "emb_linear": convert_linear(sd, f"{prefix}.emb_layers.1"),
        "norm": convert_layernorm(sd, f"{prefix}.norm"),
        "out_linear": convert_linear(sd, f"{prefix}.out_layers.2"),
    }


def convert_md_layer(sd: Dict, prefix: str) -> Dict:
    """LinearTemporalDiffusionTransformerDecoderLayer with
    use_MLD_Transformer=True (`mdiff_transformer.py:257-304`)."""
    return {
        "sa_block": convert_encoder_layer(sd, f"{prefix}.sa_block"),
        "ca_block": {
            "norm": convert_layernorm(sd, f"{prefix}.ca_block.norm"),
            "text_norm": convert_layernorm(sd, f"{prefix}.ca_block.text_norm"),
            "query": convert_linear(sd, f"{prefix}.ca_block.query"),
            "key": convert_linear(sd, f"{prefix}.ca_block.key"),
            "value": convert_linear(sd, f"{prefix}.ca_block.value"),
            "proj_out": convert_stylization_block(sd, f"{prefix}.ca_block.proj_out"),
        },
        "ffn": {
            "linear1": convert_linear(sd, f"{prefix}.ffn.linear1"),
            "linear2": convert_linear(sd, f"{prefix}.ffn.linear2"),
            "proj_out": convert_stylization_block(sd, f"{prefix}.ffn.proj_out"),
        },
    }


def convert_denoiser(sd: Dict, num_layers: int = 5, md_trans: bool = True) -> Dict:
    params = {
        "time_embedding": {
            "linear_1": convert_linear(sd, "time_embedding.linear_1"),
            "linear_2": convert_linear(sd, "time_embedding.linear_2"),
        },
        "query_pos": convert_learned_pe(sd, "query_pos"),
    }
    if "decoder.layers.0.self_attn.in_proj_weight" in sd:
        # arch='trans_dec': plain TransformerDecoder stack + mem_pos
        # (`mld_denoiser.py:133-149`, modules_novae/denoiser.yaml)
        n = sum(1 for k in sd
                if k.startswith("decoder.layers.")
                and k.endswith(".self_attn.in_proj_weight"))
        dec: Dict = {
            f"layer_{i}": convert_decoder_layer(sd, f"decoder.layers.{i}")
            for i in range(n)
        }
        dec["norm"] = convert_layernorm(sd, "decoder.norm")
        params["decoder"] = dec
        params["mem_pos"] = convert_learned_pe(sd, "mem_pos")
    else:
        n_block = (num_layers - 1) // 2
        conv = convert_md_layer if md_trans else convert_encoder_layer
        enc: Dict = {}
        for i in range(n_block):
            enc[f"input_{i}"] = conv(sd, f"encoder.input_blocks.{i}")
            enc[f"output_{i}"] = conv(sd, f"encoder.output_blocks.{i}")
            enc[f"skip_linear_{i}"] = convert_linear(sd, f"encoder.linear_blocks.{i}")
        enc["middle"] = conv(sd, "encoder.middle_block")
        enc["norm"] = convert_layernorm(sd, "encoder.norm")
        params["encoder"] = enc
    if "emb_proj.1.weight" in sd:
        params["emb_proj_dense"] = convert_linear(sd, "emb_proj.1")
    if "pose_embd.weight" in sd:
        params["pose_embd"] = convert_linear(sd, "pose_embd")
        params["pose_proj"] = convert_linear(sd, "pose_proj")
    return {"params": params}


def infer_skip_layers(sd: Dict, prefix: str = "encoder.input_blocks.") -> int:
    """num_layers of a SkipTransformer stack from its state-dict keys
    (2 * n_input_blocks + 1); None when the prefix is absent."""
    ids = {int(k.split(prefix)[1].split(".")[0])
           for k in sd if k.startswith(prefix)}
    return 2 * (max(ids) + 1) + 1 if ids else None


def infer_md_trans(sd: Dict) -> bool:
    """MD stylization layers carry sa_block/ca_block submodules."""
    return any(".sa_block." in k for k in sd)


def infer_glow_shape(sd: Dict, prefix: str = "flow.flow") -> tuple:
    """(num_layers, depth, features, hidden, context) of a ConditionalGlow
    from its state-dict keys: 3 transforms per layer (ActNorm/LULinear/
    Coupling), ResidualNet depth from `.blocks.N`, context from the
    initial-layer input width minus features//2."""
    tids = {int(k.split("._transforms.")[1].split(".")[0])
            for k in sd if f"{prefix}._transform._transforms." in k}
    num_layers = (max(tids) + 1) // 3
    D = sd[f"{prefix}._transform._transforms.0.log_scale"].shape[-1]
    bids = {int(k.split(".blocks.")[1].split(".")[0])
            for k in sd if prefix in k and ".blocks." in k}
    depth = max(bids) + 1
    init_key = next(k for k in sd
                    if k.startswith(prefix) and k.endswith("initial_layer.weight"))
    hidden = sd[init_key].shape[0]
    ctx = sd[init_key].shape[1] - D // 2
    return num_layers, depth, D, hidden, ctx


def infer_gcn_layers(sd: Dict, prefix: str = "diffusion_model.gconv_layers.") -> int:
    ids = {int(k.split(prefix)[1].split(".")[0])
           for k in sd if k.startswith(prefix)}
    return max(ids) + 1 if ids else 0


def convert_mld_checkpoint(state_dict: Dict, num_layers: int = None,
                           md_trans: bool = None,
                           vae_arch: str = "encoder_decoder") -> Dict:
    """Full MLD Lightning checkpoint -> {vae, denoiser, output_scene...}.
    Applies the reference's key filters: text_encoder absent, `smpl.*` /
    `proscene.smpl.*` dropped. num_layers/md_trans default to per-subtree
    inference from the state dict (the vae and denoiser stacks may differ;
    the reference vae ctor hard-codes 5 layers, `mld_vae.py:51-53`)."""
    sd = {k: v for k, v in state_dict.items() if not k.startswith(("smpl_model.", "text_encoder."))}
    vae_sd = {k[len("vae."):]: v for k, v in sd.items() if k.startswith("vae.")}
    den_sd = {k[len("denoiser."):]: v for k, v in sd.items() if k.startswith("denoiser.")}
    out = {}
    if vae_sd:  # stage-1 checkpoints are VAE-only
        vae_layers = num_layers or infer_skip_layers(vae_sd) or 5
        out["vae"] = convert_motion_vae(vae_sd, vae_layers, arch=vae_arch)
    if den_sd:
        den_layers = num_layers or infer_skip_layers(den_sd) or 5
        den_md = infer_md_trans(den_sd) if md_trans is None else md_trans
        out["denoiser"] = convert_denoiser(den_sd, den_layers, den_md)
    if "output_scene.1.weight" in sd:
        out["output_scene"] = {"params": {"linear": convert_linear(sd, "output_scene.1")}}
    if "output_images.1.weight" in sd:
        out["output_images"] = {"params": {"linear": convert_linear(sd, "output_images.1")}}
    scene_sd = {
        k[len("proscene.scene_enc."):]: v
        for k, v in sd.items()
        if k.startswith("proscene.scene_enc.")
    }
    if scene_sd:
        out["scene_encoder"] = convert_pointnet(scene_sd)
    return out


def convert_pointnet(sd: Dict) -> Dict:
    """ResnetPointnet -> split-block layout (`nn/pointnet.py`): blocks 1-3
    take the concat [x; pooled]; the torch fc_0/shortcut weights split into
    x/pooled halves by input rows."""
    def split_block(prefix, h):
        w0 = _t(sd[f"{prefix}.fc_0.weight"])  # (h, 2h)
        ws = _t(sd[f"{prefix}.shortcut.weight"])  # (h, 2h)
        return {
            "fc_0_x": {"kernel": w0[:, :h].T, "bias": _t(sd[f"{prefix}.fc_0.bias"])},
            "fc_0_p": {"kernel": w0[:, h:].T},
            "fc_1": convert_linear(sd, f"{prefix}.fc_1"),
            "shortcut_x": {"kernel": ws[:, :h].T},
            "shortcut_p": {"kernel": ws[:, h:].T},
        }

    h = _t(sd["block_0.fc_0.weight"]).shape[0]
    params = {
        "fc_pos_0": convert_linear(sd, "fc_pos_0"),
        "fc_c": convert_linear(sd, "fc_c"),
        "block_0": {
            "fc_0": convert_linear(sd, "block_0.fc_0"),
            "fc_1": convert_linear(sd, "block_0.fc_1"),
            "shortcut": {"kernel": _t(sd["block_0.shortcut.weight"]).T},
        },
    }
    for i in (1, 2, 3):
        params[f"block_{i}"] = split_block(f"block_{i}", h)
    return {"params": params}


def _linear_wb(sd: Dict, prefix: str) -> Dict:
    """torch Linear -> the {w: (out, in), b} layout flows/glow.py consumes."""
    return {"w": _t(sd[f"{prefix}.weight"]), "b": _t(sd[f"{prefix}.bias"])}


def convert_glow(sd: Dict, prefix: str, num_layers: int, depth: int,
                 use_batch_norm: bool = True) -> Dict:
    """nflows ConditionalGlow -> flows/glow.py params. Transform indices:
    layer i occupies composite slots 3i (ActNorm), 3i+1 (LULinear),
    3i+2 (coupling)."""
    layers = []
    for i in range(num_layers):
        an = f"{prefix}._transform._transforms.{3 * i}"
        lu = f"{prefix}._transform._transforms.{3 * i + 1}"
        cp = f"{prefix}._transform._transforms.{3 * i + 2}.transform_net"
        resnet: Dict = {
            "initial": _linear_wb(sd, f"{cp}.initial_layer"),
            "final": _linear_wb(sd, f"{cp}.final_layer"),
            "blocks": [],
        }
        for j in range(depth):
            block = {
                "linear0": _linear_wb(sd, f"{cp}.blocks.{j}.linear_layers.0"),
                "linear1": _linear_wb(sd, f"{cp}.blocks.{j}.linear_layers.1"),
            }
            if use_batch_norm:
                for k in (0, 1):
                    bnp = f"{cp}.blocks.{j}.batch_norm_layers.{k}"
                    block[f"bn{k}"] = {
                        "scale": _t(sd[f"{bnp}.weight"]),
                        "bias": _t(sd[f"{bnp}.bias"]),
                        "mean": _t(sd[f"{bnp}.running_mean"]),
                        "var": _t(sd[f"{bnp}.running_var"]),
                    }
            resnet["blocks"].append(block)
        layers.append(
            {
                "actnorm": {
                    "log_scale": _t(sd[f"{an}.log_scale"]),
                    "shift": _t(sd[f"{an}.shift"]),
                },
                "lu": {
                    "lower_entries": _t(sd[f"{lu}.lower_entries"]),
                    "upper_entries": _t(sd[f"{lu}.upper_entries"]),
                    "unconstrained_upper_diag": _t(sd[f"{lu}.unconstrained_upper_diag"]),
                    "bias": _t(sd[f"{lu}.bias"]),
                },
                "coupling": {"resnet": resnet},
            }
        )
    return {"layers": layers}


def convert_resnet50(sd: Dict, prefix: str = "") -> Dict:
    """torchvision-style ResNet50 -> nn/resnet.py params + batch stats."""
    p = (prefix + ".") if prefix else ""

    def conv(name):
        return {"kernel": _t(sd[f"{p}{name}.weight"]).transpose(2, 3, 1, 0)}

    def bn(name):
        return (
            {"scale": _t(sd[f"{p}{name}.weight"]), "bias": _t(sd[f"{p}{name}.bias"])},
            {"mean": _t(sd[f"{p}{name}.running_mean"]), "var": _t(sd[f"{p}{name}.running_var"])},
        )

    params: Dict = {}
    stats: Dict = {}
    params["conv1"] = conv("conv1")
    params["bn1"], stats["bn1"] = bn("bn1")
    blocks_per = {1: 3, 2: 4, 3: 6, 4: 3}
    for stage, nb in blocks_per.items():
        for b in range(nb):
            name = f"layer{stage}_{b}"
            t = f"layer{stage}.{b}"
            sub_p: Dict = {}
            sub_s: Dict = {}
            for c in (1, 2, 3):
                sub_p[f"conv{c}"] = conv(f"{t}.conv{c}")
                sub_p[f"bn{c}"], sub_s[f"bn{c}"] = bn(f"{t}.bn{c}")
            if f"{p}{t}.downsample.0.weight" in sd:
                sub_p["downsample_conv"] = conv(f"{t}.downsample.0")
                sub_p["downsample_bn"], sub_s["downsample_bn"] = bn(f"{t}.downsample.1")
            params[name] = sub_p
            stats[name] = sub_s
    return {"params": params, "batch_stats": stats}


def convert_bigru(sd: Dict, prefix: str) -> Dict:
    """torch.nn.GRU (bidirectional, 1 layer) -> nn/gru.py BiGru."""
    def direction(suffix):
        return {
            "cell": {
                "weight_ih": {
                    "kernel": _t(sd[f"{prefix}.weight_ih_l0{suffix}"]).T,
                    "bias": _t(sd[f"{prefix}.bias_ih_l0{suffix}"]),
                },
                "weight_hh": {
                    "kernel": _t(sd[f"{prefix}.weight_hh_l0{suffix}"]).T,
                    "bias": _t(sd[f"{prefix}.bias_hh_l0{suffix}"]),
                },
            }
        }

    return {"fwd": direction(""), "bwd": direction("_reverse")}


def _modulated_gconv(sd: Dict, prefix: str) -> Dict:
    """ModulatedGraphConv W/M/adj2/bias map 1:1 (`modulated_gcn_conv.py:15-36`
    -> nn/gcn.py): W is (2, in, out) on both sides, no transpose."""
    return {
        "W": _t(sd[f"{prefix}.W"]),
        "M": _t(sd[f"{prefix}.M"]),
        "adj2": _t(sd[f"{prefix}.adj2"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _gcn_block(sd: Dict, prefix: str):
    """_GraphConv (gconv + BatchNorm1d) -> GraphConvBlock params/batch_stats."""
    params = {
        "gconv": _modulated_gconv(sd, f"{prefix}.gconv"),
        "bn": {"scale": _t(sd[f"{prefix}.bn.weight"]),
               "bias": _t(sd[f"{prefix}.bn.bias"])},
    }
    stats = {"bn": {"mean": _t(sd[f"{prefix}.bn.running_mean"]),
                    "var": _t(sd[f"{prefix}.bn.running_var"])}}
    return params, stats


def convert_egohmr(sd: Dict, num_gcn_layers: int = 4) -> Dict:
    """EgoHMR `best_model_mpjpe_vis.pt` (`EgoHMR/models/egohmr/egohmr.py:36-`)
    -> models/egohmr.py EgoHmr.init_params layout. smpl.* buffer keys must be
    filtered by the caller (`mld.py:1199-1209` does the same)."""
    gcn_params, gcn_stats = {}, {}
    p, s = _gcn_block(sd, "diffusion_model.gconv_input.0")
    gcn_params["gconv_input"], gcn_stats["gconv_input"] = p, s
    for i in range(num_gcn_layers):
        sub_p, sub_s = {}, {}
        for j in (1, 2):
            p, s = _gcn_block(sd, f"diffusion_model.gconv_layers.{i}.gconv{j}")
            sub_p[f"gconv{j}"], sub_s[f"gconv{j}"] = p, s
        gcn_params[f"res_{i}"], gcn_stats[f"res_{i}"] = sub_p, sub_s
    gcn_params["gconv_output"] = _modulated_gconv(sd, "diffusion_model.gconv_output")

    return {
        "backbone": convert_resnet50(sd, "backbone"),
        "scene_enc": convert_pointnet(
            {k[len("scene_enc."):]: v for k, v in sd.items()
             if k.startswith("scene_enc.")}
        ),
        "transl_enc": {"params": {
            "fc1": convert_linear(sd, "transl_enc.layers.0"),
            "fc2": convert_linear(sd, "transl_enc.layers.2"),
        }},
        "timestep_embedder": {"params": {
            "linear_1": convert_linear(sd, "embed_timestep.time_embed.0"),
            "linear_2": convert_linear(sd, "embed_timestep.time_embed.2"),
        }},
        "input_process": {"params": convert_linear(sd, "input_process.poseEmbedding")},
        "gcn": {"params": gcn_params, "batch_stats": gcn_stats},
        "beta_layer": {"params": {
            "fc1": convert_linear(sd, "beta_layer.layers.0"),
            "fc2": convert_linear(sd, "beta_layer.layers.2"),
        }},
    }


def convert_a2m_gru(sd: Dict) -> Dict:
    """action2motion GRU recognition model (`humanact12_gru.py:6-82`) ->
    eval/action_classifier.py MotionDiscriminator. torch stacked nn.GRU
    layers weight_ih_l{k}/weight_hh_l{k} map onto recurrent/cell_{k}; gate
    order (r, z, n) matches GruCell."""
    n_layers = sum(1 for k in sd if k.startswith("recurrent.weight_ih_l")
                   and not k.endswith("_reverse"))
    recurrent = {}
    for k in range(n_layers):
        recurrent[f"cell_{k}"] = {
            "weight_ih": {
                "kernel": _t(sd[f"recurrent.weight_ih_l{k}"]).T,
                "bias": _t(sd[f"recurrent.bias_ih_l{k}"]),
            },
            "weight_hh": {
                "kernel": _t(sd[f"recurrent.weight_hh_l{k}"]).T,
                "bias": _t(sd[f"recurrent.bias_hh_l{k}"]),
            },
        }
    return {
        "params": {
            "recurrent": recurrent,
            "linear1": convert_linear(sd, "linear1"),
            "linear2": convert_linear(sd, "linear2"),
        }
    }


def _bn(sd: Dict, prefix: str) -> Dict:
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }


def _conv2d(sd: Dict, prefix: str) -> Dict:
    # torch (out, in, kH, kW) -> flax (kH, kW, in, out)
    return {
        "kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def convert_uestc_stgcn(sd: Dict) -> Dict:
    """UESTC ST-GCN recognition model (`uestc_stgcn.py:8-111`) ->
    eval/stgcn.py STGCN. The final 1x1 Conv2d classifier maps to a Dense
    over the pooled features (identical math)."""
    params: Dict = {"data_bn": _bn(sd, "data_bn")}
    n_blocks = sum(1 for k in sd if k.endswith(".gcn.conv.weight"))
    for i in range(n_blocks):
        p = f"st_gcn_networks.{i}"
        block = {
            "gcn": {"conv": _conv2d(sd, f"{p}.gcn.conv")},
            "bn1": _bn(sd, f"{p}.tcn.0"),
            "tcn": _conv2d(sd, f"{p}.tcn.2"),
            "bn2": _bn(sd, f"{p}.tcn.3"),
        }
        if f"{p}.residual.0.weight" in sd:
            block["res_conv"] = _conv2d(sd, f"{p}.residual.0")
            block["res_bn"] = _bn(sd, f"{p}.residual.1")
        params[f"block_{i}"] = block
        if f"edge_importance.{i}" in sd:
            params[f"edge_importance_{i}"] = _t(sd[f"edge_importance.{i}"])
    params["fcn"] = {
        "kernel": _t(sd["fcn.weight"])[:, :, 0, 0].T,
        "bias": _t(sd["fcn.bias"]),
    }
    return {"params": params}


def convert_t2m_textencoder(sd: Dict) -> Dict:
    return {
        "params": {
            "pos_emb": convert_linear(sd, "pos_emb"),
            "input_emb": convert_linear(sd, "input_emb"),
            "hidden": _t(sd["hidden"]),
            "gru": convert_bigru(sd, "gru"),
            "out_0": convert_linear(sd, "output_net.0"),
            "out_ln": convert_layernorm(sd, "output_net.1"),
            "out_1": convert_linear(sd, "output_net.3"),
        }
    }


def convert_t2m_motionencoder(sd: Dict) -> Dict:
    return {
        "params": {
            "input_emb": convert_linear(sd, "input_emb"),
            "hidden": _t(sd["hidden"]),
            "gru": convert_bigru(sd, "gru"),
            "out_0": convert_linear(sd, "output_net.0"),
            "out_ln": convert_layernorm(sd, "output_net.1"),
            "out_1": convert_linear(sd, "output_net.3"),
        }
    }


def convert_t2m_movementencoder(sd: Dict) -> Dict:
    return {
        "params": {
            "conv1": {
                "kernel": _t(sd["main.0.weight"]).transpose(2, 1, 0),
                "bias": _t(sd["main.0.bias"]),
            },
            "conv2": {
                "kernel": _t(sd["main.3.weight"]).transpose(2, 1, 0),
                "bias": _t(sd["main.3.bias"]),
            },
            "out_net": convert_linear(sd, "out_net"),
        }
    }


def _t2m_sub(sd: Dict, key: str) -> Dict:
    """The released `text_mot_match/model/finest.tar` bundles the three t2m
    evaluators as nested state dicts keyed 'text_encoder' /
    'movement_encoder' / 'motion_encoder'; standalone .tar saves are bare
    state dicts, and some re-saves flatten to prefixed keys. Accept all
    three, so one --src file serves all three kinds (preflight.py shares
    this resolution)."""
    if key in sd and isinstance(sd[key], dict):
        return sd[key]
    prefix = key + "."
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
    return sd


def main():
    # conversion is pure host work; pin the CPU backend BEFORE orbax/seeme
    # imports can initialize the default one — with the axon TPU relay
    # unreachable, backend discovery otherwise blocks indefinitely
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True,
                    choices=["mld", "prohmr", "egohmr", "t2m_text",
                             "t2m_motion", "t2m_move", "a2m_gru",
                             "uestc_stgcn"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--num_layers", type=int, default=None,
                    help="override; default: inferred from the state dict")
    ap.add_argument("--md_trans", action="store_true", default=None,
                    help="override; default: inferred from the state dict")
    ap.add_argument("--vae_arch", default="encoder_decoder",
                    choices=["encoder_decoder", "all_encoder"])
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)

    if args.kind == "mld":
        params = convert_mld_checkpoint(sd, args.num_layers, args.md_trans,
                                        vae_arch=args.vae_arch)
    elif args.kind == "prohmr":
        sd = {k: v for k, v in sd.items() if not k.startswith("smpl")}
        g_layers, g_depth, _, _, _ = infer_glow_shape(sd, "flow.flow")
        params = {
            "backbone": convert_resnet50(sd, "backbone"),
            "scene_enc": convert_pointnet(
                {k[len("scene_enc."):]: v for k, v in sd.items() if k.startswith("scene_enc.")}
            ),
            "flow": convert_glow(sd, "flow.flow", num_layers=g_layers,
                                 depth=g_depth),
            "fc_head": {
                "params": {
                    "fc1": convert_linear(sd, "flow.fc_head.layers.0"),
                    "fc2": convert_linear(sd, "flow.fc_head.layers.2"),
                }
            },
        }
    elif args.kind == "egohmr":
        sd = {k: v for k, v in sd.items()
              if not k.startswith(("smpl", "criterion"))}
        params = convert_egohmr(sd, num_gcn_layers=infer_gcn_layers(sd))
    elif args.kind == "t2m_text":
        params = convert_t2m_textencoder(_t2m_sub(sd, "text_encoder"))
    elif args.kind == "t2m_motion":
        params = convert_t2m_motionencoder(_t2m_sub(sd, "motion_encoder"))
    elif args.kind == "a2m_gru":
        params = convert_a2m_gru(sd)
    elif args.kind == "uestc_stgcn":
        params = convert_uestc_stgcn(sd)
    else:
        params = convert_t2m_movementencoder(_t2m_sub(sd, "movement_encoder"))

    from seeme_tpu.train.checkpoint import save_params

    save_params(args.dst, params)
    print(f"converted {args.kind}: {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
