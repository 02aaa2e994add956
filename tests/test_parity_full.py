"""Full-model torch-replica golden tests.

Per-module conversion parity lives in test_convert.py; these tests compose the
*whole* reference forward passes as independent torch replicas, convert their
state dicts through tools/convert_checkpoint.py, and assert end-to-end forward
parity. Until real checkpoints/datasets land, this is the strongest available
evidence that converted reference checkpoints reproduce reference numerics.

Replicated reference paths (behavior studied, not copied):
  * MldVae.encode/decode — `mld/models/architectures/mld_vae.py:128-256`
    (encoder_decoder arch, MLP_DIST=False, learned PE, post-norm U-skip).
  * MldDenoiser.forward — `mld_denoiser.py:151-244`, both the MD_TRANS
    stylization path (`mdiff_transformer.py:257-304`) and the plain
    trans_enc path with emb_proj (text_encoded_dim != latent_dim).
  * SMPLFlow log_prob / forward — `EgoHMR/models/prohmr/smpl_flow.py:36-120`
    over nflows ConditionalGlow (`nflows/nflows/flows/glow.py:15-64`) +
    FCHead (`fc_head.py:7-52`), i.e. the flow head of
    ProHMRScene.forward_step (`prohmr_scene.py:140-170`).
  * EgoHMR denoising core — `EgoHMR/models/egohmr/egohmr.py:197-327`:
    conditioning assembly, timestep table, ModulatedGCN x0 prediction,
    visibility-guided fusion, betas head (encoders pass-through; their
    conversion parity lives in test_convert.py).
"""

import math
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

sys.path.insert(0, "tools")
from convert_checkpoint import (  # noqa: E402
    convert_glow,
    convert_linear,
    convert_mld_checkpoint,
)

from seeme_tpu.flows.glow import (  # noqa: E402
    GlowConfig,
    glow_log_prob,
    glow_sample_and_log_prob,
)
from seeme_tpu.models.denoiser import Denoiser  # noqa: E402
from seeme_tpu.models.prohmr import FCHead  # noqa: E402
from seeme_tpu.models.vae import MotionVae  # noqa: E402

# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


torch.manual_seed(0)


# --------------------------------------------------------------------------
# torch replicas of the DETR stack (`cross_attention.py:258-433`, post-norm)
# --------------------------------------------------------------------------

class TEncoderLayer(tnn.Module):
    def __init__(self, d, heads, ff, act=F.gelu):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, heads, dropout=0.0)
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)
        self.act = act

    def forward(self, src, src_key_padding_mask=None):
        a = self.self_attn(src, src, src,
                           key_padding_mask=src_key_padding_mask)[0]
        src = self.norm1(src + a)
        h = self.linear2(self.act(self.linear1(src)))
        return self.norm2(src + h)


class TDecoderLayer(tnn.Module):
    def __init__(self, d, heads, ff):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, heads, dropout=0.0)
        self.multihead_attn = tnn.MultiheadAttention(d, heads, dropout=0.0)
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)
        self.norm3 = tnn.LayerNorm(d)

    def forward(self, tgt, memory, tgt_key_padding_mask=None):
        a = self.self_attn(tgt, tgt, tgt,
                           key_padding_mask=tgt_key_padding_mask)[0]
        tgt = self.norm1(tgt + a)
        a = self.multihead_attn(tgt, memory, memory)[0]
        tgt = self.norm2(tgt + a)
        h = self.linear2(F.gelu(self.linear1(tgt)))
        return self.norm3(tgt + h)


class TSkipStack(tnn.Module):
    """U-skip stack; attribute names match the reference so the converted
    state-dict keys line up (`input_blocks`/`middle_block`/`output_blocks`/
    `linear_blocks`/`norm`)."""

    def __init__(self, make_layer, num_layers, d):
        super().__init__()
        n = (num_layers - 1) // 2
        self.input_blocks = tnn.ModuleList([make_layer() for _ in range(n)])
        self.middle_block = make_layer()
        self.output_blocks = tnn.ModuleList([make_layer() for _ in range(n)])
        self.linear_blocks = tnn.ModuleList(
            [tnn.Linear(2 * d, d) for _ in range(n)])
        self.norm = tnn.LayerNorm(d)

    def forward(self, x, *args, **kw):
        skips = []
        for blk in self.input_blocks:
            x = blk(x, *args, **kw)
            skips.append(x)
        x = self.middle_block(x, *args, **kw)
        for blk, lin in zip(self.output_blocks, self.linear_blocks):
            x = lin(torch.cat([x, skips.pop()], dim=-1))
            x = blk(x, *args, **kw)
        return self.norm(x)


class TLearnedPE(tnn.Module):
    def __init__(self, d, max_len=500):  # reference max_len (`position_encoding.py:140`)
        super().__init__()
        self.pe = tnn.Parameter(torch.rand(max_len, 1, d))

    def forward(self, x):  # seq-first
        return x + self.pe[: x.shape[0]]


class TVae(tnn.Module):
    """MldVae replica: encoder_decoder arch, mlp_dist=False
    (`mld_vae.py:33-256`); seq-first like torch."""

    def __init__(self, nfeats, latent_size, d, heads, ff, num_layers):
        super().__init__()
        self.latent_size, self.d = latent_size, d
        self.skel_embedding = tnn.Linear(nfeats, d)
        self.final_layer = tnn.Linear(d, nfeats)
        self.global_motion_token = tnn.Parameter(
            torch.randn(latent_size * 2, d))
        self.query_pos_encoder = TLearnedPE(d)
        self.query_pos_decoder = TLearnedPE(d)
        self.encoder = TSkipStack(
            lambda: TEncoderLayer(d, heads, ff), num_layers, d)
        self.decoder = TSkipStack(
            lambda: TDecoderLayer(d, heads, ff), num_layers, d)

    def encode(self, features, mask):
        B = features.shape[0]
        x = self.skel_embedding(features).permute(1, 0, 2)
        dist = self.global_motion_token[:, None, :].expand(-1, B, -1)
        aug = torch.cat(
            [torch.ones(B, dist.shape[0], dtype=torch.bool), mask], dim=1)
        xseq = self.query_pos_encoder(torch.cat([dist, x], dim=0))
        out = self.encoder(xseq, src_key_padding_mask=~aug)[: dist.shape[0]]
        return out[: self.latent_size], out[self.latent_size:]

    def decode(self, z, mask):
        B, T = mask.shape
        queries = self.query_pos_decoder(torch.zeros(T, B, self.d))
        out = self.decoder(queries, z, tgt_key_padding_mask=~mask)
        return self.final_layer(out).permute(1, 0, 2)


def test_mld_vae_full_forward_parity():
    nfeats, latent_size, d, heads, ff, L = 9, 2, 32, 2, 48, 3
    tvae = TVae(nfeats, latent_size, d, heads, ff, L).eval()

    B, T = 3, 8
    feats = torch.randn(B, T, nfeats)
    lengths = torch.tensor([8, 5, 3])
    mask = torch.arange(T)[None] < lengths[:, None]
    with torch.no_grad():
        mu_t, logvar_t = tvae.encode(feats, mask)
        rst_t = tvae.decode(mu_t, mask)

    sd = {f"vae.{k}": v for k, v in tvae.state_dict().items()}
    params = convert_mld_checkpoint(sd, num_layers=L)["vae"]

    m = MotionVae(nfeats=nfeats, latent_dim=(latent_size, d), ff_size=ff,
                  num_layers=L, num_heads=heads)
    mu_j, logvar_j = m.apply(
        params, jnp.asarray(feats.numpy()), jnp.asarray(lengths.numpy()),
        method="encode")
    np.testing.assert_allclose(
        np.asarray(mu_j), mu_t.permute(1, 0, 2).numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logvar_j), logvar_t.permute(1, 0, 2).numpy(), atol=1e-4)

    rst_j = m.apply(params, mu_j, T, jnp.asarray(lengths.numpy()),
                    method="decode")
    np.testing.assert_allclose(np.asarray(rst_j), rst_t.numpy(), atol=1e-4)


# --------------------------------------------------------------------------
# torch replica of the MD_TRANS denoiser (`mld_denoiser.py` +
# `mdiff_transformer.py:137-304`)
# --------------------------------------------------------------------------

class TStylization(tnn.Module):
    def __init__(self, d, time_dim):
        super().__init__()
        self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(time_dim, 2 * d))
        self.norm = tnn.LayerNorm(d)
        self.out_layers = tnn.Sequential(
            tnn.SiLU(), tnn.Dropout(0.0), tnn.Linear(d, d))

    def forward(self, h, emb):
        scale, shift = torch.chunk(self.emb_layers(emb).unsqueeze(1), 2, dim=2)
        h = self.norm(h) * (1 + scale) + shift
        return self.out_layers(h)


class TLinearCrossAttn(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.num_head = heads
        self.norm = tnn.LayerNorm(d)
        self.text_norm = tnn.LayerNorm(d)
        self.query = tnn.Linear(d, d)
        self.key = tnn.Linear(d, d)
        self.value = tnn.Linear(d, d)
        self.proj_out = TStylization(d, d)

    def forward(self, x, xf, emb):
        B, T, D = x.shape
        N, H = xf.shape[1], self.num_head
        q = F.softmax(self.query(self.norm(x)).view(B, T, H, -1), dim=-1)
        k = F.softmax(self.key(self.text_norm(xf)).view(B, N, H, -1), dim=1)
        v = self.value(self.text_norm(xf)).view(B, N, H, -1)
        att = torch.einsum("bnhd,bnhl->bhdl", k, v)
        y = torch.einsum("bnhd,bhdl->bnhl", q, att).reshape(B, T, D)
        return x + self.proj_out(y, emb)


class TStyledFFN(tnn.Module):
    def __init__(self, d, ff):
        super().__init__()
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.proj_out = TStylization(d, d)

    def forward(self, x, emb):
        y = self.linear2(F.gelu(self.linear1(x)))
        return x + self.proj_out(y, emb)


class TMdLayer(tnn.Module):
    """`LinearTemporalDiffusionTransformerDecoderLayer` with
    use_MLD_Transformer=True; operates seq-first like the skip stack."""

    def __init__(self, d, heads, ff):
        super().__init__()
        self.sa_block = TEncoderLayer(d, heads, 1024, act=F.relu)
        self.ca_block = TLinearCrossAttn(d, heads)
        self.ffn = TStyledFFN(d, ff)

    def forward(self, x, xf=None, emb=None):
        T = x.shape[0]
        seq = self.sa_block(torch.cat([x, xf, emb], dim=0))
        xb = seq[:T].permute(1, 0, 2)
        emb_vec = emb[0]
        xb = self.ca_block(xb, xf.permute(1, 0, 2), emb_vec)
        xb = self.ffn(xb, emb_vec)
        return xb.permute(1, 0, 2)


def _t_timestep_embedding(timesteps, dim):
    """diffusers get_timestep_embedding, flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
    emb = timesteps.float()[:, None] * freqs[None]
    emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)


class TTimestepEmbedding(tnn.Module):
    def __init__(self, in_dim, d):
        super().__init__()
        self.linear_1 = tnn.Linear(in_dim, d)
        self.linear_2 = tnn.Linear(d, d)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TDenoiser(tnn.Module):
    """MldDenoiser replica (`mld_denoiser.py:151-244`), trans_enc arch."""

    def __init__(self, d, heads, ff, num_layers, md_trans, text_dim):
        super().__init__()
        self.md_trans, self.text_dim, self.d = md_trans, text_dim, d
        self.time_embedding = TTimestepEmbedding(text_dim, d)
        if text_dim != d:
            self.emb_proj = tnn.Sequential(tnn.ReLU(), tnn.Linear(text_dim, d))
        self.query_pos = TLearnedPE(d)
        if md_trans:
            make = lambda: TMdLayer(d, heads, ff)  # noqa: E731
        else:
            make = lambda: TEncoderLayer(d, heads, ff)  # noqa: E731
        self.encoder = TSkipStack(make, num_layers, d)

    def forward(self, sample, timestep, cond):
        sample = sample.permute(1, 0, 2)  # (n_latent, B, D)
        n_latent, B = sample.shape[:2]
        t_emb = _t_timestep_embedding(timestep.expand(B), self.text_dim)
        time_emb = self.time_embedding(t_emb).unsqueeze(0)
        cond = cond.permute(1, 0, 2)
        text_emb = self.emb_proj(cond) if self.text_dim != self.d else cond
        if self.md_trans:
            xseq = self.query_pos(sample)
            tokens = self.encoder(xseq, xf=text_emb, emb=time_emb)
        else:
            xseq = self.query_pos(torch.cat([sample, time_emb, text_emb], 0))
            tokens = self.encoder(xseq)
        return tokens[:n_latent].permute(1, 0, 2)


@pytest.mark.parametrize("md_trans,text_dim", [(True, 32), (False, 16)])
def test_mld_denoiser_full_forward_parity(md_trans, text_dim):
    d, heads, ff, L = 32, 2, 48, 3
    tden = TDenoiser(d, heads, ff, L, md_trans, text_dim).eval()
    # the zero_module()-initialized linears would mask conversion bugs —
    # randomize them so every converted weight participates
    with torch.no_grad():
        for name, p in tden.named_parameters():
            if p.abs().max() == 0:
                p.normal_(0, 0.05)

    B, n_latent, n_cond = 3, 2, 3
    sample = torch.randn(B, n_latent, d)
    cond = torch.randn(B, n_cond, text_dim)
    t = torch.tensor(517)
    with torch.no_grad():
        ref = tden(sample, t, cond)

    sd = {f"denoiser.{k}": v for k, v in tden.state_dict().items()}
    params = convert_mld_checkpoint(sd, num_layers=L, md_trans=md_trans)[
        "denoiser"]

    m = Denoiser(latent_dim=(n_latent, d), ff_size=ff, num_layers=L,
                 num_heads=heads, text_encoded_dim=text_dim,
                 md_trans=md_trans)
    out = m.apply(params, jnp.asarray(sample.numpy()),
                  jnp.full((B,), 517, jnp.int32), jnp.asarray(cond.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


# --------------------------------------------------------------------------
# torch replica of SMPLFlow over nflows ConditionalGlow
# --------------------------------------------------------------------------

class TActNorm(tnn.Module):
    def __init__(self, D):
        super().__init__()
        self.register_buffer("initialized", torch.tensor(True))
        self.log_scale = tnn.Parameter(torch.randn(D) * 0.1)
        self.shift = tnn.Parameter(torch.randn(D) * 0.1)

    def forward(self, x):
        out = torch.exp(self.log_scale) * x + self.shift
        return out, self.log_scale.sum().expand(x.shape[0])

    def inverse(self, x):
        out = (x - self.shift) / torch.exp(self.log_scale)
        return out, -self.log_scale.sum().expand(x.shape[0])


class TLULinear(tnn.Module):
    def __init__(self, D, eps=1e-3):
        super().__init__()
        self.D, self.eps = D, eps
        n_tri = (D - 1) * D // 2
        self.lower_entries = tnn.Parameter(torch.randn(n_tri) * 0.1)
        self.upper_entries = tnn.Parameter(torch.randn(n_tri) * 0.1)
        self.unconstrained_upper_diag = tnn.Parameter(torch.randn(D) * 0.3)
        self.bias = tnn.Parameter(torch.randn(D) * 0.1)

    def _lu(self):
        D = self.D
        lower = torch.zeros(D, D)
        lower[np.tril_indices(D, -1)] = self.lower_entries
        lower = lower + torch.eye(D)
        upper = torch.zeros(D, D)
        upper[np.triu_indices(D, 1)] = self.upper_entries
        upper = upper + torch.diag(
            F.softplus(self.unconstrained_upper_diag) + self.eps)
        return lower, upper

    def _logdet(self):
        return torch.log(
            F.softplus(self.unconstrained_upper_diag) + self.eps).sum()

    def forward(self, x):
        lower, upper = self._lu()
        out = F.linear(F.linear(x, upper), lower, self.bias)
        return out, self._logdet().expand(x.shape[0])

    def inverse(self, x):
        lower, upper = self._lu()
        out = torch.linalg.solve_triangular(
            lower, (x - self.bias).t(), upper=False, unitriangular=True)
        out = torch.linalg.solve_triangular(upper, out, upper=True).t()
        return out, -self._logdet().expand(x.shape[0])


class TResidualNet(tnn.Module):
    """nflows ResidualNet with context concat at the input only
    (`nn/nets/resnet.py:56-104`; blocks get context=None)."""

    def __init__(self, in_f, out_f, h, ctx, n_blocks):
        super().__init__()
        self.initial_layer = tnn.Linear(in_f + ctx, h)

        def block():
            m = tnn.Module()
            m.linear_layers = tnn.ModuleList([tnn.Linear(h, h) for _ in range(2)])
            m.batch_norm_layers = tnn.ModuleList(
                [tnn.BatchNorm1d(h) for _ in range(2)])
            return m

        self.blocks = tnn.ModuleList([block() for _ in range(n_blocks)])
        self.final_layer = tnn.Linear(h, out_f)

    def forward(self, x, context):
        h = self.initial_layer(torch.cat([x, context], dim=1))
        for b in self.blocks:
            t = b.batch_norm_layers[0](h)
            t = b.linear_layers[0](F.relu(t))
            t = b.batch_norm_layers[1](t)
            t = b.linear_layers[1](F.relu(t))
            h = h + t
        return self.final_layer(h)


class TAdditiveCoupling(tnn.Module):
    def __init__(self, mask, h, ctx, n_blocks):
        super().__init__()
        self.register_buffer("id_idx", torch.nonzero(mask <= 0)[:, 0])
        self.register_buffer("tr_idx", torch.nonzero(mask > 0)[:, 0])
        self.transform_net = TResidualNet(
            len(self.id_idx), len(self.tr_idx), h, ctx, n_blocks)

    def forward(self, x, context):
        shift = self.transform_net(x[:, self.id_idx], context)
        out = x.clone()
        out[:, self.tr_idx] = x[:, self.tr_idx] + shift
        return out, torch.zeros(x.shape[0])

    def inverse(self, x, context):
        shift = self.transform_net(x[:, self.id_idx], context)
        out = x.clone()
        out[:, self.tr_idx] = x[:, self.tr_idx] - shift
        return out, torch.zeros(x.shape[0])


class TGlow(tnn.Module):
    """ConditionalGlow replica; `_transform._transforms` naming matches
    nflows so convert_glow key paths line up."""

    def __init__(self, D, h, num_layers, depth, ctx):
        super().__init__()
        self.D = D
        mask = torch.ones(D)
        mask[::2] = -1
        transforms = []
        for _ in range(num_layers):
            transforms += [TActNorm(D), TLULinear(D),
                           TAdditiveCoupling(mask, h, ctx, depth)]
            mask = -mask
        self._transform = tnn.Module()
        self._transform._transforms = tnn.ModuleList(transforms)

    def log_prob(self, x, context):
        total = torch.zeros(x.shape[0])
        for tr in self._transform._transforms:
            if isinstance(tr, TAdditiveCoupling):
                x, ld = tr(x, context)
            else:
                x, ld = tr(x)
            total = total + ld
        base = -0.5 * (x * x).sum(-1) - 0.5 * self.D * math.log(2 * math.pi)
        return base + total, x

    def sample_with_noise(self, noise, context):
        x = noise
        total = torch.zeros(x.shape[0])
        for tr in reversed(self._transform._transforms):
            if isinstance(tr, TAdditiveCoupling):
                x, ld = tr.inverse(x, context)
            else:
                x, ld = tr.inverse(x)
            total = total + ld
        base = -0.5 * (noise * noise).sum(-1) - 0.5 * self.D * math.log(2 * math.pi)
        return x, base - total


class TSMPLFlowHead(tnn.Module):
    def __init__(self, D, h, num_layers, depth, ctx, fc_features):
        super().__init__()
        self.flow = TGlow(D, h, num_layers, depth, ctx)
        self.fc_head = tnn.Module()
        self.fc_head.layers = tnn.Sequential(
            tnn.Linear(ctx, fc_features), tnn.ReLU(),
            tnn.Linear(fc_features, 13))


def _perturb_bn_stats(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.6, 1.4)


def test_smplflow_head_parity():
    """Composed ConditionalGlow + FCHead parity: log_prob on GT poses, the
    z=0 mode sample, random-noise samples, and betas/cam offsets — the full
    flow head of `prohmr_scene.py:140-170`."""
    D, h, num_layers, depth, ctx, fc = 12, 24, 3, 2, 7, 16
    tm = TSMPLFlowHead(D, h, num_layers, depth, ctx, fc).eval()
    _perturb_bn_stats(tm)

    B, S = 4, 3
    rng = np.random.RandomState(0)
    pose = torch.tensor(rng.randn(B, D).astype(np.float32))
    context = torch.tensor(rng.randn(B, ctx).astype(np.float32))
    noise = torch.tensor(rng.randn(B, S, D).astype(np.float32))

    with torch.no_grad():
        lp_t, z_t = tm.flow.log_prob(pose, context)
        ctx_rep = context.repeat_interleave(S, dim=0)
        samp_t, slp_t = tm.flow.sample_with_noise(
            noise.reshape(B * S, D), ctx_rep)
        offset_t = tm.fc_head.layers(context)

    sd = {f"flow.{k}": v for k, v in tm.state_dict().items()}
    cfg = GlowConfig(features=D, hidden_features=h, num_layers=num_layers,
                     num_blocks_per_layer=depth, context_features=ctx)
    flow_params = convert_glow(sd, "flow.flow", num_layers=num_layers,
                               depth=depth)

    lp_j, z_j = glow_log_prob(flow_params, cfg, jnp.asarray(pose.numpy()),
                              jnp.asarray(context.numpy()))
    np.testing.assert_allclose(np.asarray(lp_j), lp_t.numpy(),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=1e-4)

    samp_j, slp_j, _ = glow_sample_and_log_prob(
        flow_params, cfg, S, jnp.asarray(context.numpy()),
        noise=jnp.asarray(noise.numpy()))
    np.testing.assert_allclose(np.asarray(samp_j), samp_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(slp_j), slp_t.numpy(),
                               rtol=1e-5, atol=1e-4)

    # z=0 mode sample (`prohmr_scene.py:146-161`)
    z0 = torch.zeros(B, 1, D)
    with torch.no_grad():
        mode_t, _ = tm.flow.sample_with_noise(z0.reshape(B, D), context)
    mode_j, _, _ = glow_sample_and_log_prob(
        flow_params, cfg, 1, jnp.asarray(context.numpy()),
        noise=jnp.zeros((B, 1, D)))
    np.testing.assert_allclose(np.asarray(mode_j), mode_t.numpy(), atol=1e-4)

    # FCHead betas/cam offsets
    fc_params = {"params": {
        "fc1": convert_linear(sd, "flow.fc_head.layers.0"),
        "fc2": convert_linear(sd, "flow.fc_head.layers.2"),
    }}
    off_j = FCHead(fc).apply(fc_params, jnp.asarray(context.numpy()))
    np.testing.assert_allclose(np.asarray(off_j), offset_t.numpy(), atol=1e-5)


class TPlainDecoder(tnn.Module):
    """Plain TransformerDecoder stack (`cross_attention.py:217-255`)."""

    def __init__(self, make_layer, num_layers, d):
        super().__init__()
        self.layers = tnn.ModuleList([make_layer() for _ in range(num_layers)])
        self.norm = tnn.LayerNorm(d)

    def forward(self, tgt, memory):
        x = tgt
        for layer in self.layers:
            x = layer(x, memory)
        return self.norm(x)


class TNovaeDenoiser(tnn.Module):
    """MldDenoiser replica for arch='trans_dec' + diffusion_only
    (`mld_denoiser.py:56-59, 133-149, 222-239` — the novae config)."""

    def __init__(self, nfeats, d, heads, ff, num_layers, text_dim):
        super().__init__()
        self.text_dim, self.d = text_dim, d
        self.pose_embd = tnn.Linear(nfeats, d)
        self.pose_proj = tnn.Linear(d, nfeats)
        self.time_embedding = TTimestepEmbedding(text_dim, d)
        if text_dim != d:
            self.emb_proj = tnn.Sequential(tnn.ReLU(), tnn.Linear(text_dim, d))
        self.query_pos = TLearnedPE(d)
        self.mem_pos = TLearnedPE(d)
        self.decoder = TPlainDecoder(
            lambda: TDecoderLayer(d, heads, ff), num_layers, d)

    def forward(self, sample, timestep, cond, mask):
        sample = sample.permute(1, 0, 2)  # (T, B, nfeats)
        B = sample.shape[1]
        t_emb = _t_timestep_embedding(timestep.expand(B), self.text_dim)
        time_emb = self.time_embedding(t_emb).unsqueeze(0)
        cond = cond.permute(1, 0, 2)
        text_emb = self.emb_proj(cond) if self.text_dim != self.d else cond
        memory = self.mem_pos(torch.cat([time_emb, text_emb], dim=0))
        x = self.query_pos(self.pose_embd(sample))
        out = self.pose_proj(self.decoder(x, memory))
        out = out.permute(1, 0, 2)
        return out * mask[..., None]


def test_novae_trans_dec_denoiser_parity():
    """arch='trans_dec' diffusion-only denoiser (config_novae_humanml3d)."""
    nfeats, d, heads, ff, L, text_dim = 11, 32, 2, 48, 3, 16
    tden = TNovaeDenoiser(nfeats, d, heads, ff, L, text_dim).eval()

    B, T, n_cond = 3, 7, 2
    sample = torch.randn(B, T, nfeats)
    cond = torch.randn(B, n_cond, text_dim)
    lengths = torch.tensor([7, 5, 3])
    mask = torch.arange(T)[None] < lengths[:, None]
    with torch.no_grad():
        ref = tden(sample, torch.tensor(321), cond, mask)

    sd = {f"denoiser.{k}": v for k, v in tden.state_dict().items()}
    params = convert_mld_checkpoint(sd, num_layers=L)["denoiser"]

    m = Denoiser(nfeats=nfeats, latent_dim=(1, d), ff_size=ff, num_layers=L,
                 num_heads=heads, text_encoded_dim=text_dim,
                 diffusion_only=True, arch="trans_dec")
    out = m.apply(params, jnp.asarray(sample.numpy()),
                  jnp.full((B,), 321, jnp.int32), jnp.asarray(cond.numpy()),
                  jnp.asarray(lengths.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


# --------------------------------------------------------------------------
# EgoHMR denoising core — `EgoHMR/models/egohmr/egohmr.py:197-327`: per-joint
# conditioning assembly, timestep table+MLP, pose embedding, ModulatedGCN
# x0 prediction, visibility-guided cond/uncond fusion, betas head. The two
# frozen encoders (ResNet50, PointNet) have their own conversion parity
# tests in test_convert.py and are replaced by pass-through features here.
# --------------------------------------------------------------------------

class TModulatedG(tnn.Module):
    """ModulatedGraphConv (`modulated_gcn_conv.py:15-53`)."""

    def __init__(self, adj_t, J, din, dout):
        super().__init__()
        self.W = tnn.Parameter(torch.randn(2, din, dout) * 0.2)
        self.M = tnn.Parameter(torch.rand(J, dout))
        self.adj2 = tnn.Parameter(torch.randn(J, J) * 0.01)
        self.bias = tnn.Parameter(torch.randn(dout) / math.sqrt(dout))
        self.adj_t = adj_t

    def forward(self, x):
        h0, h1 = x @ self.W[0], x @ self.W[1]
        adj = self.adj_t + self.adj2
        adj = (adj.T + adj) / 2
        eye = torch.eye(adj.shape[0])
        return (adj * eye) @ (self.M * h0) + (adj * (1 - eye)) @ (self.M * h1) + self.bias


class TGBlock(tnn.Module):
    def __init__(self, adj_t, J, din, dout):
        super().__init__()
        self.gconv = TModulatedG(adj_t, J, din, dout)
        self.bn = tnn.BatchNorm1d(dout)

    def forward(self, x):
        return torch.relu(self.bn(self.gconv(x).transpose(1, 2)).transpose(1, 2))


class TGRes(tnn.Module):
    def __init__(self, adj_t, J, h):
        super().__init__()
        self.gconv1 = TGBlock(adj_t, J, h, h)
        self.gconv2 = TGBlock(adj_t, J, h, h)

    def forward(self, x):
        return x + self.gconv2(self.gconv1(x))


class TEgoGCN(tnn.Module):
    def __init__(self, adj_t, J, din, h, dout, layers):
        super().__init__()
        self.gconv_input = tnn.Sequential(TGBlock(adj_t, J, din, h))
        self.gconv_layers = tnn.Sequential(*[TGRes(adj_t, J, h) for _ in range(layers)])
        self.gconv_output = TModulatedG(adj_t, J, h, dout)

    def forward(self, x):
        return self.gconv_output(self.gconv_layers(self.gconv_input(x)))


class TEgoTimestep(tnn.Module):
    """PositionalEncoding table + time_embed MLP (`egohmr.py:634-668`)."""

    def __init__(self, d, max_len=5000):
        super().__init__()
        self.time_embed = tnn.Sequential(tnn.Linear(d, d), tnn.SiLU(), tnn.Linear(d, d))
        pe = torch.zeros(max_len, d)
        pos = torch.arange(max_len, dtype=torch.float32)[:, None]
        div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32) * (-math.log(10000.0) / d))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe)

    def forward(self, t):
        return self.time_embed(self.pe[t])


class TSeqMLP(tnn.Module):
    def __init__(self, din, hidden, dout):
        super().__init__()
        self.layers = tnn.Sequential(tnn.Linear(din, hidden), tnn.ReLU(),
                                     tnn.Linear(hidden, dout))

    def forward(self, x):
        return self.layers(x)


class TInputProcess(tnn.Module):
    def __init__(self, dout):
        super().__init__()
        self.poseEmbedding = tnn.Linear(6, dout)

    def forward(self, x):
        return self.poseEmbedding(x)


class TEgoCore(tnn.Module):
    """EgoHMR forward with pass-through image/scene features."""

    def __init__(self, adj_t, cfg, init_betas):
        super().__init__()
        ctx = cfg.context_dim
        self.embed_timestep = TEgoTimestep(cfg.timestep_embed_dim)
        self.transl_enc = TSeqMLP(3, 64, cfg.transl_embed_dim)
        self.input_process = TInputProcess(cfg.input_process_dim)
        self.beta_layer = TSeqMLP(ctx, 1024, 10)
        self.diffusion_model = TEgoGCN(adj_t, 24, cfg.gcn_in_dim,
                                       cfg.gcn_hid_dim, 6, cfg.gcn_layers)
        self.init_betas = init_betas
        self.cfg = cfg

    def cam_feats(self, batch):
        orig_fx = batch["fx"] * self.cfg.fx_norm_coeff
        cam = torch.stack([batch["cam_cx"] / orig_fx, batch["cam_cy"] / orig_fx], -1)
        bbox = torch.stack([batch["box_center"][:, 0] / orig_fx,
                            batch["box_center"][:, 1] / orig_fx,
                            batch["box_size"] / orig_fx], -1)
        return torch.cat([cam, bbox, batch["fx"][:, None]], -1)

    def denoise(self, cond, x_t, t):
        B = x_t.shape[0]
        x_feat = self.input_process(x_t.view(B, 24, 6))
        t_emb = self.embed_timestep(t)[:, None].expand(B, 24, -1)
        return self.diffusion_model(torch.cat([cond, x_feat, t_emb], -1)).reshape(B, 144)

    def forward(self, batch, x_t, t, vis_mask):
        B = x_t.shape[0]
        img, scene = batch["img"], batch["scene_pcd"]  # pass-through feats
        transl_feat = self.transl_enc(batch["transl"])
        rest = torch.cat([scene, transl_feat, self.cam_feats(batch)], -1)
        rest = rest[:, None].expand(B, 24, -1)
        img_pj = img[:, None] * vis_mask[..., None].float()
        cond = torch.cat([img_pj, rest], -1)
        cond_un = cond.clone()
        cond_un[:, :, : self.cfg.img_feat_dim] = 0.0  # force_mask, img only
        pred = self.denoise(cond, x_t, t)
        pred_un = self.denoise(cond_un, x_t, t)
        vis6 = vis_mask.repeat_interleave(6, dim=-1)
        pred = torch.where(vis6, pred, pred_un)
        betas = self.beta_layer(torch.cat([img, rest[:, 0]], -1)) + self.init_betas
        return pred, betas


def test_egohmr_denoising_core_full_forward_parity():
    import jax

    import flax.linen as fnn
    from convert_checkpoint import _gcn_block, _modulated_gconv
    from seeme_tpu.core import synthetic_smpl
    from seeme_tpu.models.egohmr import OPENPOSE_TO_SMPL, EgoHmr, EgoHmrConfig
    from seeme_tpu.nn.gcn import smpl_adjacency

    cfg = EgoHmrConfig(img_feat_dim=32, scene_feat_dim=16, transl_embed_dim=8,
                       input_process_dim=12, timestep_embed_dim=16,
                       gcn_hid_dim=24, gcn_layers=2, num_train_timesteps=50,
                       timestep_respacing="ddim5")
    init_betas = np.random.RandomState(3).randn(10).astype(np.float32) * 0.2

    adj_t = torch.tensor(smpl_adjacency(), dtype=torch.float32)
    tcore = TEgoCore(adj_t, cfg, torch.tensor(init_betas)).eval()
    with torch.no_grad():
        for m in tcore.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    B = 3
    rng = np.random.RandomState(0)
    kp2d = rng.randn(B, 25, 3).astype(np.float32)
    kp2d[..., -1] = (rng.rand(B, 25) > 0.4).astype(np.float32)
    batch_np = {
        "img": rng.randn(B, 32).astype(np.float32),
        "scene_pcd": rng.randn(B, 16).astype(np.float32),
        "transl": rng.randn(B, 3).astype(np.float32),
        "fx": np.full(B, 1.2, np.float32),
        "cam_cx": np.full(B, 960.0, np.float32),
        "cam_cy": np.full(B, 540.0, np.float32),
        "box_center": rng.rand(B, 2).astype(np.float32) * 500,
        "box_size": np.full(B, 200.0, np.float32),
    }
    x_t = rng.randn(B, 144).astype(np.float32)
    t = np.array([3, 17, 42])

    vis_op = torch.tensor(kp2d[..., -1] > 0)
    vis_op[:, 8] = True
    vis_t = vis_op[:, OPENPOSE_TO_SMPL]
    tb = {k: torch.tensor(v) for k, v in batch_np.items()}
    with torch.no_grad():
        ref_pred, ref_betas = tcore(tb, torch.tensor(x_t), torch.tensor(t), vis_t)

    # convert through the same key mapping convert_egohmr applies
    sd = tcore.state_dict()
    gcn_params, gcn_stats = {}, {}
    p, s = _gcn_block(sd, "diffusion_model.gconv_input.0")
    gcn_params["gconv_input"], gcn_stats["gconv_input"] = p, s
    for i in range(cfg.gcn_layers):
        sub_p, sub_s = {}, {}
        for j in (1, 2):
            p, s = _gcn_block(sd, f"diffusion_model.gconv_layers.{i}.gconv{j}")
            sub_p[f"gconv{j}"], sub_s[f"gconv{j}"] = p, s
        gcn_params[f"res_{i}"], gcn_stats[f"res_{i}"] = sub_p, sub_s
    gcn_params["gconv_output"] = _modulated_gconv(sd, "diffusion_model.gconv_output")

    class PassThrough(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return x

    model = EgoHmr(cfg, synthetic_smpl(n_verts=64), mean_betas=init_betas)
    model.backbone = PassThrough()
    model.scene_enc = PassThrough()
    params = model.init_params(jax.random.PRNGKey(0))
    params["gcn"] = {"params": gcn_params, "batch_stats": gcn_stats}
    params["transl_enc"] = {"params": {
        "fc1": convert_linear(sd, "transl_enc.layers.0"),
        "fc2": convert_linear(sd, "transl_enc.layers.2"),
    }}
    params["timestep_embedder"] = {"params": {
        "linear_1": convert_linear(sd, "embed_timestep.time_embed.0"),
        "linear_2": convert_linear(sd, "embed_timestep.time_embed.2"),
    }}
    params["input_process"] = {"params": convert_linear(sd, "input_process.poseEmbedding")}
    params["beta_layer"] = {"params": {
        "fc1": convert_linear(sd, "beta_layer.layers.0"),
        "fc2": convert_linear(sd, "beta_layer.layers.2"),
    }}

    jb = {
        "img": jnp.asarray(batch_np["img"]),
        "scene_pcd": jnp.asarray(batch_np["scene_pcd"]),
        "fx": jnp.asarray(batch_np["fx"]),
        "cam_cx": jnp.asarray(batch_np["cam_cx"]),
        "cam_cy": jnp.asarray(batch_np["cam_cy"]),
        "box_center": jnp.asarray(batch_np["box_center"]),
        "box_size": jnp.asarray(batch_np["box_size"]),
        "orig_keypoints_2d": jnp.asarray(kp2d),
        "smpl_params": {"transl": jnp.asarray(batch_np["transl"])},
    }
    out = model.forward(params, jb, jnp.asarray(x_t), jnp.asarray(t),
                        eval_with_uncond=True)
    np.testing.assert_allclose(np.asarray(out["pred_x_start"]),
                               ref_pred.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_smpl_params"]["betas"]),
                               ref_betas.numpy(), atol=2e-4)
