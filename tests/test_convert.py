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
