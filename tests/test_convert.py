"""Weight-conversion parity tests: build torch modules, convert their state
dicts with tools/convert_checkpoint.py, and compare outputs against the flax
modules. This is the evidence that converted reference checkpoints reproduce
reference numerics."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

sys.path.insert(0, "tools")
from convert_checkpoint import (  # noqa: E402
    convert_bigru,
    convert_linear,
    convert_mha,
    convert_pointnet,
)

from seeme_tpu.nn.gru import BiGru  # noqa: E402
from seeme_tpu.nn.pointnet import ResnetPointnet  # noqa: E402
from seeme_tpu.nn.transformer import MultiHeadAttention  # noqa: E402

# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


torch.manual_seed(0)


class TestMultiheadAttention:
    @pytest.mark.parametrize("heads", [1, 4])
    def test_matches_torch(self, heads):
        D, B, T = 32, 2, 7
        tmha = tnn.MultiheadAttention(D, heads, dropout=0.0)
        x = torch.randn(T, B, D)
        with torch.no_grad():
            ref, _ = tmha(x, x, x)
        params = {"params": convert_mha({f"mha.{k}": v for k, v in tmha.state_dict().items()}, "mha")}
        ours = MultiHeadAttention(D, heads)
        xb = jnp.asarray(x.permute(1, 0, 2).numpy())  # batch-first
        out = ours.apply(params, xb, xb, xb)
        np.testing.assert_allclose(
            np.asarray(out), ref.permute(1, 0, 2).numpy(), atol=2e-5
        )

    def test_key_padding_mask(self):
        D, B, T = 16, 2, 5
        tmha = tnn.MultiheadAttention(D, 2, dropout=0.0)
        x = torch.randn(T, B, D)
        pad = torch.zeros(B, T, dtype=torch.bool)
        pad[0, 3:] = True  # padded positions (torch: True = ignore)
        with torch.no_grad():
            ref, _ = tmha(x, x, x, key_padding_mask=pad)
        params = {"params": convert_mha({f"m.{k}": v for k, v in tmha.state_dict().items()}, "m")}
        ours = MultiHeadAttention(D, 2)
        xb = jnp.asarray(x.permute(1, 0, 2).numpy())
        out = ours.apply(params, xb, xb, xb, key_valid_mask=jnp.asarray(~pad.numpy()))
        np.testing.assert_allclose(
            np.asarray(out), ref.permute(1, 0, 2).numpy(), atol=2e-5
        )


class TestGru:
    def test_bidirectional_packed_semantics(self):
        H, D, B, T = 24, 12, 3, 9
        tgru = tnn.GRU(D, H, batch_first=True, bidirectional=True)
        x = torch.randn(B, T, D)
        lens = torch.tensor([9, 6, 4])
        packed = tnn.utils.rnn.pack_padded_sequence(x, lens, batch_first=True)
        h0 = torch.randn(2, B, H)
        with torch.no_grad():
            _, h_last = tgru(packed, h0)
        ref = torch.cat([h_last[0], h_last[1]], dim=-1).numpy()

        params = {"params": convert_bigru({f"g.{k}": v for k, v in tgru.state_dict().items()}, "g")}
        ours = BiGru(H)
        out = ours.apply(
            params, jnp.asarray(x.numpy()), jnp.asarray(lens.numpy()),
            jnp.asarray(h0.numpy()),
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


class TorchPointnet(tnn.Module):
    """Independent torch implementation of the reference ResnetPointnet
    contract (concat layout) used as conversion oracle."""

    def __init__(self, out_dim=64, hidden=32):
        super().__init__()
        h = hidden

        def block(size_in):
            m = tnn.Module()
            m.fc_0 = tnn.Linear(size_in, h)
            m.fc_1 = tnn.Linear(h, h)
            m.shortcut = tnn.Linear(size_in, h, bias=False)
            return m

        self.fc_pos_0 = tnn.Linear(3, 2 * h)
        self.block_0 = block(2 * h)
        self.block_1 = block(2 * h)
        self.block_2 = block(2 * h)
        self.block_3 = block(2 * h)
        self.fc_c = tnn.Linear(h, out_dim)

    @staticmethod
    def _res(m, x):
        net = m.fc_0(torch.relu(x))
        dx = m.fc_1(torch.relu(net))
        return m.shortcut(x) + dx

    def forward(self, p):
        net = self.fc_pos_0(p)
        net = self._res(self.block_0, net)
        for m in (self.block_1, self.block_2, self.block_3):
            pooled = net.max(dim=1, keepdim=True)[0].expand(net.shape)
            net = self._res(m, torch.cat([net, pooled], dim=2))
        net = net.max(dim=1)[0]
        return self.fc_c(torch.relu(net))


class TestPointnetConversion:
    def test_split_block_layout_matches_concat(self):
        tm = TorchPointnet()
        x = torch.randn(2, 50, 3)
        with torch.no_grad():
            ref = tm(x).numpy()
        params = convert_pointnet(tm.state_dict())
        ours = ResnetPointnet(out_dim=64, hidden_dim=32)
        out = ours.apply(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


class TestLULinear:
    def test_forward_inverse_match_torch_solve(self):
        """LU forward y = L(Ux)+b and triangular-solve inverse parity."""
        from seeme_tpu.flows.glow import GlowConfig, _lu_forward, _lu_inverse

        D = 8
        rng = np.random.RandomState(0)
        n_tri = (D - 1) * D // 2
        lu = {
            "lower_entries": jnp.asarray(rng.randn(n_tri).astype(np.float32) * 0.1),
            "upper_entries": jnp.asarray(rng.randn(n_tri).astype(np.float32) * 0.1),
            "unconstrained_upper_diag": jnp.asarray(rng.randn(D).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(D).astype(np.float32)),
        }
        cfg = GlowConfig(features=D)
        x = jnp.asarray(rng.randn(4, D).astype(np.float32))
        y, ld = _lu_forward(lu, cfg, x)

        # torch oracle
        lower = torch.zeros(D, D)
        li = np.tril_indices(D, k=-1)
        lower[li] = torch.tensor(np.asarray(lu["lower_entries"]))
        lower += torch.eye(D)
        upper = torch.zeros(D, D)
        ui = np.triu_indices(D, k=1)
        upper[ui] = torch.tensor(np.asarray(lu["upper_entries"]))
        diag = torch.nn.functional.softplus(
            torch.tensor(np.asarray(lu["unconstrained_upper_diag"]))
        ) + 1e-3
        upper += torch.diag(diag)
        xt = torch.tensor(np.asarray(x))
        yt = xt @ upper.T @ lower.T + torch.tensor(np.asarray(lu["bias"]))
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=1e-5)
        np.testing.assert_allclose(float(ld[0]), float(torch.log(diag).sum()), rtol=1e-5)

        x2, _ = _lu_inverse(lu, cfg, y)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_linear_conversion_roundtrip():
    lin = tnn.Linear(6, 4)
    p = convert_linear({f"l.{k}": v for k, v in lin.state_dict().items()}, "l")
    x = np.random.RandomState(0).randn(3, 6).astype(np.float32)
    ref = lin(torch.tensor(x)).detach().numpy()
    ours = x @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_a2m_gru_classifier_parity():
    """Freshly-initialized torch stacked-GRU recognition model converted via
    convert_a2m_gru must match MotionDiscriminator outputs at the selected
    last-valid step (zero initial hidden on both sides)."""
    import torch

    from seeme_tpu.eval.action_classifier import MotionDiscriminator
    from tools.convert_checkpoint import convert_a2m_gru

    torch.manual_seed(0)
    D, H, L, C = 12, 16, 2, 5
    tm = torch.nn.Module()
    tm.recurrent = torch.nn.GRU(D, H, L)
    tm.linear1 = torch.nn.Linear(H, 30)
    tm.linear2 = torch.nn.Linear(30, C)
    sd = {k: v for k, v in tm.state_dict().items()}

    B, T = 3, 9
    x = torch.randn(T, B, D)
    lengths = torch.tensor([9, 5, 2])
    with torch.no_grad():
        gru_o, _ = tm.recurrent(x, torch.zeros(L, B, H))
        out = gru_o[lengths - 1, torch.arange(B)]
        feats_t = torch.tanh(tm.linear1(out))
        logits_t = tm.linear2(feats_t)

    params = convert_a2m_gru(sd)
    m = MotionDiscriminator(hidden_size=H, num_layers=L, output_size=C)
    logits_j, feats_j = m.apply(
        params, jnp.asarray(x.permute(1, 0, 2).numpy()),
        jnp.asarray(lengths.numpy()),
    )
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(feats_j), feats_t.numpy(), atol=1e-5)


def test_uestc_stgcn_parity():
    """Torch replica of the UESTC ST-GCN evaluator (same ops/ordering as
    uestc_stgcn.py st_gcn blocks, eval mode) converted via
    convert_uestc_stgcn must match eval/stgcn.py STGCN to fp32 tolerance."""
    import torch
    import torch.nn as tnn

    from seeme_tpu.eval.stgcn import STGCN, smpl_spatial_adjacency
    from tools.convert_checkpoint import convert_uestc_stgcn

    torch.manual_seed(0)
    K, V, C, classes = 3, 24, 6, 7
    blocks = [(C, 64, 1, False), (64, 64, 1, True), (64, 128, 2, True),
              (128, 128, 1, True)]

    class TBlock(tnn.Module):
        def __init__(self, cin, cout, stride, residual):
            super().__init__()
            self.gcn = tnn.Module()
            self.gcn.conv = tnn.Conv2d(cin, cout * K, (1, 1))
            self.tcn = tnn.Sequential(
                tnn.BatchNorm2d(cout), tnn.ReLU(),
                tnn.Conv2d(cout, cout, (9, 1), (stride, 1), (4, 0)),
                tnn.BatchNorm2d(cout), tnn.Dropout(0),
            )
            if not residual:
                self.residual = None
            elif cin == cout and stride == 1:
                self.residual = "id"
            else:
                self.residual = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, (stride, 1)), tnn.BatchNorm2d(cout))

        def forward(self, x, A):
            if self.residual is None:
                res = 0
            elif self.residual == "id":
                res = x
            else:
                res = self.residual(x)
            y = self.gcn.conv(x)
            n, kc, t, v = y.shape
            y = y.view(n, K, kc // K, t, v)
            y = torch.einsum("nkctv,kvw->nctw", y, A)
            return torch.relu(self.tcn(y) + res)

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.data_bn = tnn.BatchNorm1d(V * C)
            self.st_gcn_networks = tnn.ModuleList(
                [TBlock(*b) for b in blocks])
            self.edge_importance = tnn.ParameterList(
                [tnn.Parameter(torch.randn(K, V, V) * 0.1 + 1)
                 for _ in blocks])
            self.fcn = tnn.Conv2d(blocks[-1][1], classes, 1)

        def forward(self, x, A):  # x: (N, C, T, V)
            N, _, T, _ = x.shape
            y = x.permute(0, 3, 1, 2).reshape(N, V * C, T)
            y = self.data_bn(y)
            y = y.view(N, V, C, T).permute(0, 2, 3, 1)
            for blk, imp in zip(self.st_gcn_networks, self.edge_importance):
                y = blk(y, A * imp)
            feats = y.mean(dim=(2, 3))
            return self.fcn(feats[:, :, None, None])[:, :, 0, 0], feats

    tm = TNet().eval()
    # perturb BN running stats away from the (0, 1) init
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    A_np = smpl_spatial_adjacency()
    A_t = torch.tensor(A_np)

    N, T = 2, 16
    x_t = torch.randn(N, C, T, V)
    with torch.no_grad():
        logits_t, feats_t = tm(x_t, A_t)

    params = convert_uestc_stgcn(tm.state_dict())

    import seeme_tpu.eval.stgcn as stgcn_mod
    old = stgcn_mod._BLOCKS
    stgcn_mod._BLOCKS = tuple((b[1], b[2]) for b in blocks)
    try:
        m = STGCN(num_class=classes, in_channels=C)
        x_j = jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())  # (N, T, V, C)
        logits_j, feats_j = m.apply(params, x_j)
    finally:
        stgcn_mod._BLOCKS = old
    np.testing.assert_allclose(np.asarray(feats_j), feats_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_egohmr_gcn_conversion_parity():
    """Torch replica of the EgoHMR ModulatedGCN stack (modulated graph conv +
    BatchNorm1d blocks, residual pairs, output conv) converted via
    convert_egohmr's block helpers must match nn/gcn.py ModulatedGCN in
    inference mode."""
    import math

    import torch
    import torch.nn as tnn

    from seeme_tpu.nn.gcn import ModulatedGCN, smpl_adjacency
    from tools.convert_checkpoint import _gcn_block, _modulated_gconv

    torch.manual_seed(0)
    J, D_in, H, D_out, L = 24, 30, 16, 6, 2
    adj_np = smpl_adjacency()
    adj_t = torch.tensor(adj_np, dtype=torch.float32)

    class TModulated(tnn.Module):
        def __init__(self, din, dout):
            super().__init__()
            self.W = tnn.Parameter(torch.randn(2, din, dout) * 0.2)
            self.M = tnn.Parameter(torch.rand(J, dout))
            self.adj2 = tnn.Parameter(torch.randn(J, J) * 0.01)
            self.bias = tnn.Parameter(torch.randn(dout) / math.sqrt(dout))

        def forward(self, x):
            h0, h1 = x @ self.W[0], x @ self.W[1]
            adj = adj_t + self.adj2
            adj = (adj.T + adj) / 2
            eye = torch.eye(J)
            out = (adj * eye) @ (self.M * h0) + (adj * (1 - eye)) @ (self.M * h1)
            return out + self.bias

    class TBlock(tnn.Module):
        def __init__(self, din, dout):
            super().__init__()
            self.gconv = TModulated(din, dout)
            self.bn = tnn.BatchNorm1d(dout)

        def forward(self, x):
            x = self.gconv(x).transpose(1, 2)
            x = self.bn(x).transpose(1, 2)
            return torch.relu(x)

    class TRes(tnn.Module):
        def __init__(self, h):
            super().__init__()
            self.gconv1 = TBlock(h, h)
            self.gconv2 = TBlock(h, h)

        def forward(self, x):
            return x + self.gconv2(self.gconv1(x))

    class TGCN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.gconv_input = tnn.Sequential(TBlock(D_in, H))
            self.gconv_layers = tnn.Sequential(*[TRes(H) for _ in range(L)])
            self.gconv_output = TModulated(H, D_out)

        def forward(self, x):
            return self.gconv_output(self.gconv_layers(self.gconv_input(x)))

    tm = TGCN().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    sd = {f"diffusion_model.{k}": v for k, v in tm.state_dict().items()}
    gcn_params, gcn_stats = {}, {}
    p, s = _gcn_block(sd, "diffusion_model.gconv_input.0")
    gcn_params["gconv_input"], gcn_stats["gconv_input"] = p, s
    for i in range(L):
        sub_p, sub_s = {}, {}
        for j in (1, 2):
            p, s = _gcn_block(sd, f"diffusion_model.gconv_layers.{i}.gconv{j}")
            sub_p[f"gconv{j}"], sub_s[f"gconv{j}"] = p, s
        gcn_params[f"res_{i}"], gcn_stats[f"res_{i}"] = sub_p, sub_s
    gcn_params["gconv_output"] = _modulated_gconv(sd, "diffusion_model.gconv_output")

    x_t = torch.randn(3, J, D_in)
    with torch.no_grad():
        out_t = tm(x_t)

    m = ModulatedGCN(adj=adj_np, hid_dim=H, out_dim=D_out, num_layers=L)
    out_j = m.apply({"params": gcn_params, "batch_stats": gcn_stats},
                    jnp.asarray(x_t.numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-4)
