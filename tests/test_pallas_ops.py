"""Pallas kernel parity tests (interpret mode on CPU — the same kernels
compile natively on TPU; see ops/pointnet_pallas.py)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from seeme_tpu.nn.pointnet import ResnetPointnet
from seeme_tpu.ops import pointnet_pallas


def _interpreted(fn, *args):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(pointnet_pallas.pl, "pallas_call", patched):
        return fn(*args)


class TestFusedPointnet:
    def test_matches_flax_reference(self):
        pn = ResnetPointnet()
        params = pn.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 3)))
        x = jnp.asarray(np.random.RandomState(0).randn(2, 256, 3).astype(np.float32))
        ref = pn.apply(params, x)
        out = _interpreted(pointnet_pallas.pointnet_forward_pallas, params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_small_hidden_dim(self):
        pn = ResnetPointnet(out_dim=512, hidden_dim=256)  # the ProHMR config
        params = pn.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 3)))
        x = jnp.asarray(np.random.RandomState(1).randn(2, 128, 3).astype(np.float32))
        ref = pn.apply(params, x)
        out = _interpreted(pointnet_pallas.pointnet_forward_pallas, params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_tile_picker(self):
        assert pointnet_pallas._pick_tile(20000) == 400
        assert pointnet_pallas._pick_tile(20480) == 512
        assert pointnet_pallas._pick_tile(1024) == 512
        assert pointnet_pallas._pick_tile(128) == 128


class TestGradients:
    def test_custom_vjp_matches_flax_grad(self):
        import jax

        pn = ResnetPointnet(out_dim=32, hidden_dim=32)
        params = pn.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 3)))
        x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 3).astype(np.float32))

        ref_grads = jax.grad(lambda p: pn.apply(p, x).sum())(params)
        our_grads = jax.grad(
            lambda p: _interpreted(pointnet_pallas.pointnet_forward_pallas, p, x).sum()
        )(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            ),
            ref_grads,
            our_grads,
        )
