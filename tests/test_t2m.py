"""Text-to-motion path tests: RIC recovery, GRU evaluators, TM2T metrics,
T2M system end-to-end on synthetic HumanML3D-shaped data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.config.loader import Config
from seeme_tpu.core.ric import qinv, qmul, qrot, recover_from_ric
from seeme_tpu.data.humanml import HumanML3DDataModule
from seeme_tpu.eval.t2m_metrics import (
    MMMetrics,
    MRMetrics,
    TM2TMetrics,
    euclidean_distance_matrix,
    frechet_distance,
    procrustes_align,
)
from seeme_tpu.models.t2m import T2MConfig, T2MSystem
from seeme_tpu.models.text_encoder import ClipTextEncoder
from seeme_tpu.nn.gru import MotionEncoderBiGRUCo, MovementConvEncoder, TextEncoderBiGRUCo


# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


class TestRic:
    def test_quaternion_ops(self):
        rng = np.random.RandomState(0)
        q = rng.randn(8, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        v = rng.randn(8, 3).astype(np.float32)
        # rotate then rotate back
        v2 = qrot(jnp.asarray(q), jnp.asarray(v))
        v3 = qrot(qinv(jnp.asarray(q)), v2)
        np.testing.assert_allclose(v3, v, atol=1e-5)
        # qmul identity
        e = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(qmul(jnp.broadcast_to(e, q.shape), jnp.asarray(q)), q, atol=1e-6)

    def test_recover_from_ric_static_root(self):
        """Zero velocities + fixed heights -> all frames stay at origin-ish."""
        T, J = 10, 22
        data = np.zeros((T, 263), np.float32)
        data[:, 3] = 0.9  # root height
        joints = np.asarray(recover_from_ric(jnp.asarray(data), J))
        assert joints.shape == (T, J, 3)
        np.testing.assert_allclose(joints[:, 0, 1], 0.9, atol=1e-6)
        np.testing.assert_allclose(joints[:, 0, 0], 0.0, atol=1e-6)

    def test_forward_velocity_integrates(self):
        T, J = 5, 22
        data = np.zeros((T, 263), np.float32)
        data[:, 1] = 0.1  # x velocity each frame
        joints = np.asarray(recover_from_ric(jnp.asarray(data), J))
        np.testing.assert_allclose(joints[:, 0, 0], 0.1 * np.arange(T), atol=1e-5)

    def test_batched(self):
        data = jnp.zeros((4, 10, 263))
        out = recover_from_ric(data, 22)
        assert out.shape == (4, 10, 22, 3)


class TestGruEncoders:
    def test_text_encoder_shapes_and_length_invariance(self):
        enc = TextEncoderBiGRUCo(hidden_size=32, output_size=16)
        B, T = 3, 12
        rng = np.random.RandomState(0)
        words = jnp.asarray(rng.randn(B, T, 300).astype(np.float32))
        pos = jnp.asarray(rng.randn(B, T, 15).astype(np.float32))
        lens = jnp.array([12, 7, 3])
        params = enc.init(jax.random.PRNGKey(0), words, pos, lens)
        out = enc.apply(params, words, pos, lens)
        assert out.shape == (3, 16)
        # frames beyond length must not affect the embedding
        words2 = words.at[1, 7:].set(99.0)
        out2 = enc.apply(params, words2, pos, lens)
        np.testing.assert_allclose(out[1], out2[1], atol=1e-5)

    def test_motion_encoder_pipeline(self):
        move = MovementConvEncoder(hidden_size=32, output_size=16)
        enc = MotionEncoderBiGRUCo(input_size=16, hidden_size=32, output_size=8)
        x = jnp.ones((2, 40, 263 - 4))
        mp = move.init(jax.random.PRNGKey(0), x)
        feats = move.apply(mp, x)
        assert feats.shape == (2, 10, 16)  # two stride-2 convs: 40 -> 10
        ep = enc.init(jax.random.PRNGKey(1), feats, jnp.array([10, 5]))
        emb = enc.apply(ep, feats, jnp.array([10, 5]))
        assert emb.shape == (2, 8)


class TestT2MMetrics:
    def test_perfect_retrieval(self):
        rng = np.random.RandomState(0)
        emb = rng.randn(64, 32).astype(np.float32)
        m = TM2TMetrics(diversity_times=30)
        m.update(emb, emb, emb)  # text == motion: retrieval is perfect
        res = m.compute()
        assert res["R_precision_top_1"] == 1.0
        assert res["FID"] < 1e-6
        assert res["Matching_score"] < 1e-2  # float32 sqrt cancellation noise

    def test_fid_separates_distributions(self):
        rng = np.random.RandomState(1)
        a = rng.randn(200, 16)
        b = rng.randn(200, 16) + 3.0
        mu1, c1 = a.mean(0), np.cov(a, rowvar=False)
        mu2, c2 = b.mean(0), np.cov(b, rowvar=False)
        assert frechet_distance(mu1, c1, mu2, c2) > frechet_distance(mu1, c1, mu1, c1)

    def test_distance_matrix(self):
        a = np.array([[0.0, 0.0], [1.0, 0.0]])
        b = np.array([[0.0, 0.0], [0.0, 2.0]])
        d = euclidean_distance_matrix(a, b)
        np.testing.assert_allclose(d, [[0, 2], [1, np.sqrt(5)]], atol=1e-6)

    def test_multimodality(self):
        rng = np.random.RandomState(2)
        mm = MMMetrics(mm_num_times=5)
        mm.update(rng.randn(4, 10, 8))
        assert np.isfinite(mm.compute()["MultiModality"])

    def test_procrustes_recovers_transform(self):
        rng = np.random.RandomState(3)
        S = rng.randn(24, 3)
        from seeme_tpu.core.rotations import aa_to_rotmat

        R = np.asarray(aa_to_rotmat(jnp.array([0.4, -0.1, 0.7])))
        S2 = 1.7 * S @ R.T + np.array([1.0, 2.0, 3.0])
        aligned = procrustes_align(S, S2)
        np.testing.assert_allclose(aligned, S2, atol=1e-5)

    def test_mr_metrics_zero_for_perfect(self):
        rng = np.random.RandomState(4)
        j = rng.randn(2, 10, 22, 3).astype(np.float32)
        m = MRMetrics()
        m.update(j, j, [10, 10])
        res = m.compute()
        assert res["MPJPE"] < 1e-4 and res["PAMPJPE"] < 1e-3


class TestT2MSystem:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = T2MConfig(max_len=32, num_inference_timesteps=5)
        system = T2MSystem(cfg)
        params = system.init_params(jax.random.PRNGKey(0))
        dm = HumanML3DDataModule(Config({"DEBUG": True, "DATASET": {"SAMPLER": {"MAX_LEN": 32, "MIN_LEN": 8}}}))
        return cfg, system, params, dm

    def test_vae_loss_with_joints(self, setup):
        cfg, system, params, dm = setup
        batch = next(dm.batches("train", 4))
        batch_j = {k: jnp.asarray(v) for k, v in batch.items() if k != "text"}
        loss, terms = system.vae_loss(
            params, batch_j, jax.random.PRNGKey(1), feats2joints=dm.feats2joints
        )
        assert np.isfinite(float(loss))
        assert "recons_joints" in terms

    def test_diffusion_loss(self, setup):
        cfg, system, params, dm = setup
        batch = next(dm.batches("train", 4))
        batch_j = {k: jnp.asarray(v) for k, v in batch.items() if k != "text"}
        loss, _ = system.diffusion_loss(params, batch_j, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))

    def test_sample_with_cfg(self, setup):
        cfg, system, params, dm = setup
        text_emb = jnp.asarray(np.random.RandomState(0).randn(2, 768).astype(np.float32))
        out = system.sample(params, text_emb, jax.random.PRNGKey(3))
        assert out.shape == (2, cfg.max_len, cfg.nfeats)
        assert np.isfinite(np.asarray(out)).all()


def test_text_encoder_modes():
    """Mode selection mirrors `mld_clip.py:38-48`: modelpath name + the
    last_hidden_state flag; hidden-state modes emit fixed-length token
    sequences."""
    enc_h = ClipTextEncoder(last_hidden_state=True, max_length=8)
    assert enc_h.name == "clip_hidden"
    out = enc_h(["a person walks"])
    assert out.shape == (1, 8, 768)
    np.testing.assert_allclose(out[0, 3:], 0.0)  # padded positions inert
    assert np.abs(out[0, :3]).sum() > 0

    enc_b = ClipTextEncoder("./deps/distilbert-base-uncased", max_length=8)
    assert enc_b.name == "bert" and enc_b.is_fallback
    assert enc_b(["hello world"]).shape == (1, 8, 768)

    assert ClipTextEncoder("./deps/clip-vit-large-patch14").name == "clip"


def test_multi_token_condition_flows():
    """(B, L>1, D) token-sequence conditions (clip_hidden/bert) run through
    both the diffusion loss and the scan sampler — the denoiser concatenates
    L condition tokens (`mld_denoiser.py:193-222`)."""
    cfg = T2MConfig(max_len=16, num_inference_timesteps=3, use_fused=False)
    system = T2MSystem(cfg)
    rng = np.random.RandomState(0)
    text_emb = jnp.asarray(rng.randn(2, 4, 768).astype(np.float32))
    params = system.init_params(jax.random.PRNGKey(0))
    batch = {
        "motion": jnp.asarray(rng.randn(2, 16, 263).astype(np.float32)),
        "length": jnp.array([16, 9]),
        "text_emb": text_emb,
    }
    loss, _ = system.diffusion_loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = system.sample(params, text_emb, jax.random.PRNGKey(2))
    assert out.shape == (2, cfg.max_len, cfg.nfeats)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_fallback_deterministic():
    enc = ClipTextEncoder()
    assert enc.is_fallback
    a = enc(["a person walks", "a person walks"])
    np.testing.assert_allclose(a[0], a[1])
    b = enc(["a person walks forward"])
    # shared words -> correlated but distinct
    assert not np.allclose(a[0], b[0])
    cos = float(
        (a[0, 0] @ b[0, 0]) / (np.linalg.norm(a[0, 0]) * np.linalg.norm(b[0, 0]))
    )
    assert cos > 0.3


def test_t2m_evaluator_embeddings():
    """T2MEvaluator: caption + motion co-embeddings feed TM2TMetrics
    (the `t2m_eval` protocol, `mld.py:1955-1995`)."""
    from seeme_tpu.eval import TM2TMetrics
    from seeme_tpu.eval.t2m_evaluator import T2MEvaluator

    ev = T2MEvaluator(nfeats=263)
    rng = np.random.RandomState(0)
    feats = rng.randn(8, 32, 263).astype(np.float32)
    lengths = np.array([32, 24, 16, 8, 32, 20, 12, 28])

    texts = [f"a person does action {i}" for i in range(8)]

    t = ev.embed_text(texts)
    m = ev.embed_motion(feats, lengths)
    assert t.shape == m.shape == (8, 512)
    # deterministic: same captions re-embed identically
    np.testing.assert_allclose(ev.embed_text(texts), t, atol=0)
    # TM2T pools need >= R_size sequences
    t = np.tile(t, (4, 1))
    m = np.tile(m, (4, 1))
    # (embeddings are NOT invariant to the padded length: the movement conv
    # encoder's edge padding sits at the end of the padded sequence, exactly
    # as in the reference pipeline — so no crop-invariance assertion here)
    # distinct motions embed distinctly
    assert not np.allclose(m[0], m[4], atol=1e-3)

    tm = TM2TMetrics(diversity_times=4)
    tm.update(t, m, m)
    out = tm.compute()
    assert np.isfinite(out["FID"]) and out["FID"] < 1e-3  # identical pools
