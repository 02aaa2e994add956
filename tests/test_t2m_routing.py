"""Sampling-route selection in T2MSystem.sample (BASELINE.md "Long-
conditioning (77-token) sampling").

The fused Pallas path must serve pooled conditions (n_cond <= 8, no mask) by
default, while 77-token clip_hidden/bert modes ALWAYS take the XLA scan: the
sample-grid token kernel measured 0.72x the scan at k=1 and monotonically
worse with multi-sample packing (scripts/TOKEN_BENCH.json — scan 18.7 vs
25.9/29.3/32.6 ms at k=1/4/8), so it was deleted with that measurement as
the decision record. Backend and kernel are stubbed so the gate itself is
what's under test (numerical parity of each route is covered by
tests/test_pallas_ops.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.models.t2m import T2MConfig, T2MSystem
import seeme_tpu.ops.denoiser_fused as df


@pytest.fixture
def routed(monkeypatch):
    """Pretend the backend is TPU and replace the kernel with a recorder."""
    calls = []
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        df, "ddim_fused",
        lambda params, cond, z0, *a, **k: calls.append("pooled") or z0)
    return calls


def _make(cfg):
    system = T2MSystem(cfg)
    params = system.init_params(jax.random.PRNGKey(0))
    return system, params


CFG = dict(max_len=16, num_inference_timesteps=4, num_layers=1, ff_size=32)


def test_pooled_cond_routes_to_fused(routed):
    system, params = _make(T2MConfig(**CFG))
    emb = jnp.asarray(np.random.RandomState(0).randn(2, 1, 768), jnp.float32)
    system.sample(params, emb, jax.random.PRNGKey(1))
    assert routed == ["pooled"]


def test_token_cond_takes_the_scan(routed):
    system, params = _make(T2MConfig(**CFG))
    emb = jnp.asarray(np.random.RandomState(0).randn(2, 77, 768), jnp.float32)
    mask = jnp.asarray(np.arange(77)[None] < 9).repeat(2, axis=0)
    out = system.sample(params, emb, jax.random.PRNGKey(1), cond_mask=mask)
    assert routed == []  # no kernel call: the XLA scan served the request
    assert out.shape == (2, 16, 263)


def test_cpu_backend_never_fuses():
    # no backend patch: the conftest pins CPU, where the kernel is skipped
    system, params = _make(T2MConfig(**CFG))
    emb = jnp.asarray(np.random.RandomState(0).randn(2, 1, 768), jnp.float32)
    out = system.sample(params, emb, jax.random.PRNGKey(1))
    assert out.shape == (2, 16, 263)
