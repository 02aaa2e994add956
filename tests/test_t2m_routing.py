"""Sampling-route selection in T2MSystem.sample (BASELINE.md "Long-
conditioning (77-token) sampling").

The fused Pallas path must serve pooled conditions (n_cond <= 8, no mask) by
default, while 77-token clip_hidden/bert modes default to the XLA scan — the
sample-grid kernel measured 0.72x the scan on real TPU
(scripts/TOKEN_BENCH.json) and is opt-in via T2MConfig.use_fused_tokens.
Backend and kernels are stubbed so the gate itself is what's under test
(the numerical parity of each route is covered by tests/test_pallas_ops.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.models.t2m import T2MConfig, T2MSystem
import seeme_tpu.ops.denoiser_fused as df


@pytest.fixture
def routed(monkeypatch):
    """Pretend the backend is TPU and replace both kernels with recorders."""
    calls = []
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        df, "ddim_fused",
        lambda params, cond, z0, *a, **k: calls.append("pooled") or z0)
    monkeypatch.setattr(
        df, "ddim_fused_tokens",
        lambda params, cond, z0, *a, **k: calls.append("tokens") or z0)
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


def test_token_cond_defaults_to_scan(routed):
    system, params = _make(T2MConfig(**CFG))
    emb = jnp.asarray(np.random.RandomState(0).randn(2, 77, 768), jnp.float32)
    mask = jnp.asarray(np.arange(77)[None] < 9).repeat(2, axis=0)
    out = system.sample(params, emb, jax.random.PRNGKey(1), cond_mask=mask)
    assert routed == []  # neither kernel: the XLA scan served the request
    assert out.shape == (2, 16, 263)


def test_token_cond_opt_in_routes_to_token_kernel(routed):
    system, params = _make(T2MConfig(use_fused_tokens=True, **CFG))
    emb = jnp.asarray(np.random.RandomState(0).randn(2, 77, 768), jnp.float32)
    mask = jnp.asarray(np.arange(77)[None] < 9).repeat(2, axis=0)
    system.sample(params, emb, jax.random.PRNGKey(1), cond_mask=mask)
    assert routed == ["tokens"]


def test_cpu_backend_never_fuses():
    # no backend patch: the conftest pins CPU, where both kernels are skipped
    system, params = _make(T2MConfig(**CFG))
    emb = jnp.asarray(np.random.RandomState(0).randn(2, 1, 768), jnp.float32)
    out = system.sample(params, emb, jax.random.PRNGKey(1))
    assert out.shape == (2, 16, 263)
