"""EgoHMR diffusion-GCN branch tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.core import synthetic_smpl
from seeme_tpu.diffusion.schedulers import DiffusionSchedule, respaced_schedule, space_timesteps
from seeme_tpu.models.egohmr import EgoHmr, EgoHmrConfig
from seeme_tpu.nn.gcn import ModulatedGCN, smpl_adjacency

CFG = EgoHmrConfig(gcn_hid_dim=64, gcn_layers=1, timestep_respacing="ddim10",
                   num_train_timesteps=100)
SMPL = synthetic_smpl(n_verts=128)


# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


def make_batch(B=2, n_pts=32, seed=0):
    rng = np.random.RandomState(seed)
    kp2d = rng.randn(B, 25, 3).astype(np.float32)
    kp2d[..., -1] = (rng.rand(B, 25) > 0.3).astype(np.float32)  # some invisible
    return {
        "img": jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32)),
        "scene_pcd": jnp.asarray(rng.randn(B, n_pts, 3).astype(np.float32)),
        "fx": jnp.ones((B,)),
        "cam_cx": jnp.full((B,), 960.0),
        "cam_cy": jnp.full((B,), 540.0),
        "box_center": jnp.asarray(rng.rand(B, 2).astype(np.float32) * 500),
        "box_size": jnp.full((B,), 200.0),
        "orig_keypoints_2d": jnp.asarray(kp2d),
        "keypoints_3d": jnp.asarray(rng.randn(B, 24, 4).astype(np.float32)),
        "keypoints_3d_full": jnp.asarray(rng.randn(B, 24, 4).astype(np.float32)),
        "smpl_params": {
            "transl": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
            "betas": jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.5),
            "body_pose": jnp.asarray(rng.randn(B, 69).astype(np.float32) * 0.3),
            "global_orient": jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.3),
        },
        "body_rep": jnp.asarray(rng.randn(B, 144).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def model():
    m = EgoHmr(CFG, SMPL)
    params = m.init_params(jax.random.PRNGKey(0))
    return m, params


class TestAdjacency:
    def test_structure(self):
        A = smpl_adjacency()
        assert A.shape == (24, 24)
        np.testing.assert_allclose(np.diag(A), 1.0)
        # pelvis connects to joints 1,2,3
        assert A[0, 1] > 0 and A[0, 2] > 0 and A[0, 3] > 0
        assert A[0, 23] == 0  # hand not adjacent to pelvis

    def test_gcn_shapes(self):
        gcn = ModulatedGCN(adj=smpl_adjacency(), hid_dim=32, out_dim=6, num_layers=1)
        x = jnp.zeros((2, 24, 50))
        params = gcn.init(jax.random.PRNGKey(0), x)
        out = gcn.apply(params, x)
        assert out.shape == (2, 24, 6)


class TestRespacing:
    def test_space_timesteps_ddim(self):
        ts = space_timesteps(1000, "ddim50")
        assert len(ts) == 50 and ts[0] == 0 and ts[-1] == 980

    def test_respaced_acp_is_subsequence(self):
        base = DiffusionSchedule(beta_schedule="squaredcos_cap_v2")
        use = space_timesteps(1000, "ddim50")
        sched, tmap = respaced_schedule(base, use)
        np.testing.assert_allclose(
            np.asarray(sched.alphas_cumprod),
            np.asarray(base.alphas_cumprod)[use],
            rtol=1e-5,
        )
        np.testing.assert_array_equal(tmap, use)


class TestForward:
    def test_visibility_masks_image_features(self, model):
        m, params = model
        batch = make_batch()
        vis = m.visibility_mask(batch)
        cond = m.conditioning(params, batch, vis)
        assert cond.shape == (2, 24, CFG.context_dim)
        # invisible joints -> zero image block
        inv = np.where(~np.asarray(vis))
        if len(inv[0]):
            b, j = inv[0][0], inv[1][0]
            np.testing.assert_allclose(np.asarray(cond)[b, j, :2048], 0.0)
        # pelvis (joint 0) always visible
        assert bool(np.asarray(vis)[:, 0].all())

    def test_force_mask_zeroes_only_image(self, model):
        m, params = model
        batch = make_batch()
        vis = m.visibility_mask(batch)
        cond = m.conditioning(params, batch, vis)
        masked = m.mask_cond(cond, force_mask=True)
        np.testing.assert_allclose(np.asarray(masked)[..., :2048], 0.0)
        np.testing.assert_allclose(
            np.asarray(masked)[..., 2048:], np.asarray(cond)[..., 2048:]
        )

    def test_forward_output_contract(self, model):
        m, params = model
        batch = make_batch()
        x_t = jnp.zeros((2, 144))
        out = m.forward(params, batch, x_t, jnp.zeros((2,), jnp.int32))
        assert out["pred_smpl_params"]["body_pose"].shape == (2, 23, 3, 3)
        assert out["pred_smpl_params"]["betas"].shape == (2, 10)
        assert out["pred_keypoints_3d"].shape == (2, 45, 3)
        assert out["pred_pose_6d"].shape == (2, 144)

    def test_training_loss_and_grads(self, model):
        m, params = model
        batch = make_batch()
        loss, terms = m.training_loss(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        grads = jax.grad(lambda p: m.training_loss(p, batch, jax.random.PRNGKey(1))[0])(params)
        gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads["gcn"]))
        assert gmax > 0


class TestSampling:
    def test_sample_runs_and_fuses(self, model):
        m, params = model
        batch = make_batch()
        out = jax.jit(lambda p, b, r: m.sample(p, b, r))(
            params, batch, jax.random.PRNGKey(2)
        )
        R = np.asarray(out["pred_smpl_params"]["body_pose"]).reshape(-1, 3, 3)
        np.testing.assert_allclose(
            R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), R.shape), atol=1e-3
        )
        assert np.isfinite(np.asarray(out["pred_vertices"])).all()


class TestGeometricLoss:
    def test_full_loss_terms(self, model):
        m, params = model
        batch = make_batch()
        loss, terms = m.training_loss(params, batch, jax.random.PRNGKey(9))
        for k in ("diffusion_mse", "loss_v2v", "loss_keypoints_3d",
                  "loss_keypoints_2d_full", "loss_pose_6d_ortho", "total"):
            assert k in terms and np.isfinite(float(terms[k])), k

    def test_grads_through_geometric(self, model):
        m, params = model
        batch = make_batch()
        g = jax.grad(lambda p: m.training_loss(p, batch, jax.random.PRNGKey(9))[0])(params)
        gm = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g["gcn"]))
        assert gm > 0


def test_collision_loss_gated_by_weight(model):
    """weight_coap_penetration > 0 adds the capsule scene-penetration term
    (the COAP role, `egohmr.py:414-443`) to compute_loss."""
    import dataclasses

    m, params = model
    batch = make_batch()
    rng = jax.random.PRNGKey(3)
    _, terms_off = m.training_loss(params, batch, rng)
    assert "loss_coap_penetration" not in terms_off

    m_on = EgoHmr(dataclasses.replace(CFG, weight_coap_penetration=0.1), SMPL)
    loss_on, terms_on = m_on.training_loss(params, batch, rng)
    assert "loss_coap_penetration" in terms_on
    assert float(terms_on["loss_coap_penetration"]) >= 0.0
    assert np.isfinite(float(loss_on))
