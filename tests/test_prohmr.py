"""ProHMR-Scene model tests: shapes, mode-at-z0 semantics, losses finite,
discriminator contract, adversarial G/D signals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.core import synthetic_smpl
from seeme_tpu.models.prohmr import ProHMRConfig, ProHMRScene

CFG = ProHMRConfig(
    flow_hidden=64, flow_layers=2, flow_depth=1,
    num_train_samples=2, num_test_samples=3,
)
SMPL = synthetic_smpl(n_verts=128)


# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model():
    m = ProHMRScene(CFG, SMPL)
    params = m.init_params(jax.random.PRNGKey(0))
    return m, params


def make_batch(B=2, n_pts=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "img": jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32)),
        "scene_pcd": jnp.asarray(rng.randn(B, n_pts, 3).astype(np.float32)),
        "fx": jnp.ones((B,)),
        "cam_cx": jnp.full((B,), 960.0),
        "cam_cy": jnp.full((B,), 540.0),
        "box_center": jnp.asarray(rng.rand(B, 2).astype(np.float32) * 500),
        "box_size": jnp.full((B,), 200.0),
        "keypoints_2d": jnp.asarray(rng.randn(B, 25, 3).astype(np.float32)),
        "orig_keypoints_2d": jnp.asarray(rng.randn(B, 25, 3).astype(np.float32)),
        "keypoints_3d": jnp.asarray(rng.randn(B, 24, 4).astype(np.float32)),
        "keypoints_3d_full": jnp.asarray(rng.randn(B, 24, 4).astype(np.float32)),
        "smpl_params": {
            "betas": jnp.asarray(rng.randn(B, 10).astype(np.float32)),
            "body_pose": jnp.asarray(rng.randn(B, 69).astype(np.float32) * 0.3),
            "global_orient": jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.3),
        },
    }


class TestForward:
    def test_conditioning_dim(self, model):
        m, params = model
        batch = make_batch()
        ctx = m.conditioning_features(params, batch)
        assert ctx.shape == (2, CFG.total_context)  # 2+3+1+2048+512 = 2566
        assert CFG.total_context == 2566

    def test_forward_step_shapes(self, model):
        m, params = model
        batch = make_batch()
        out = m.forward_step(params, batch, jax.random.PRNGKey(1), train=False)
        NS = CFG.num_test_samples
        assert out["global_orient"].shape == (2, NS, 1, 3, 3)
        assert out["body_pose"].shape == (2, NS, 23, 3, 3)
        assert out["betas"].shape == (2, NS, 10)
        assert out["pred_keypoints_3d"].shape == (2, NS, 45, 3)
        assert out["pred_vertices"].shape == (2, NS, 128, 3)
        assert out["pred_keypoints_2d"].shape == (2, NS, 45, 2)
        assert out["log_prob"].shape == (2, NS)

    def test_mode_is_deterministic_first_sample(self, model):
        """Sample 0 is the z=0 mode (`forward_step:146-158`) — identical
        across rngs; later samples differ."""
        m, params = model
        batch = make_batch()
        o1 = m.forward_step(params, batch, jax.random.PRNGKey(1))
        o2 = m.forward_step(params, batch, jax.random.PRNGKey(2))
        np.testing.assert_allclose(
            o1["pose_6d"][:, 0], o2["pose_6d"][:, 0], atol=1e-5
        )
        assert not np.allclose(o1["pose_6d"][:, 1], o2["pose_6d"][:, 1], atol=1e-4)

    def test_rotations_valid(self, model):
        m, params = model
        out = m.forward_step(params, make_batch(), jax.random.PRNGKey(1))
        R = np.asarray(out["body_pose"]).reshape(-1, 3, 3)
        np.testing.assert_allclose(
            R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), R.shape), atol=1e-4
        )


class TestLoss:
    def test_loss_finite_and_nll_drives_logprob(self, model):
        m, params = model
        batch = make_batch()
        out = m.forward_step(params, batch, jax.random.PRNGKey(1), train=True)
        total, terms = m.compute_loss(params, batch, out, jax.random.PRNGKey(2), train=True)
        assert np.isfinite(float(total))
        assert np.isfinite(float(terms["loss_nll"]))

    def test_grads_flow_to_all_submodules(self, model):
        m, params = model
        batch = make_batch()

        def loss_fn(p):
            out = m.forward_step(p, batch, jax.random.PRNGKey(1), train=True)
            total, _ = m.compute_loss(p, batch, out, jax.random.PRNGKey(2), train=True)
            return total

        grads = jax.grad(loss_fn)(params)
        for key in ("flow", "fc_head", "scene_enc"):
            gmax = max(
                float(jnp.abs(g).max()) for g in jax.tree.leaves(grads[key])
            )
            assert gmax > 0, f"no gradient into {key}"


class TestDiscriminator:
    def test_output_contract(self, model):
        m, params = model
        poses = jnp.asarray(np.random.RandomState(0).randn(4, 23, 3, 3).astype(np.float32))
        betas = jnp.zeros((4, 10))
        out = m.discriminator_outputs(params, poses, betas)
        assert out.shape == (4, 25)  # 23 per-joint + 1 betas + 1 all-joints

    def test_adversarial_losses(self, model):
        m, params = model
        rng = np.random.RandomState(1)
        fake = jnp.asarray(rng.randn(4, 23, 3, 3).astype(np.float32))
        betas = jnp.zeros((4, 10))
        d = m.discriminator_outputs(params, fake, betas)
        loss_fake = float(jnp.sum((d - 0.0) ** 2) / d.shape[0])
        loss_real = float(jnp.sum((d - 1.0) ** 2) / d.shape[0])
        assert np.isfinite(loss_fake) and np.isfinite(loss_real)
