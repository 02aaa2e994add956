"""MaxMixturePrior GMM pose prior tests (`prior.py:98-230` semantics)."""

import math
import pickle

import jax.numpy as jnp
import numpy as np

from seeme_tpu.core.pose_prior import POSE_DIM, MaxMixturePrior


def _fake_gmm(K=3, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.randn(K, POSE_DIM) * 0.3
    covs = []
    for _ in range(K):
        a = rng.randn(POSE_DIM, POSE_DIM) * 0.05
        covs.append(a @ a.T + np.eye(POSE_DIM) * 0.5)
    weights = rng.dirichlet(np.ones(K))
    return {"means": means, "covars": np.stack(covs), "weights": weights}


def test_matches_numpy_oracle(tmp_path):
    gmm = _fake_gmm()
    path = tmp_path / "gmm_03.pkl"
    with open(path, "wb") as f:
        pickle.dump(gmm, f)

    prior = MaxMixturePrior(str(path), num_gaussians=3)
    assert not prior.is_fallback

    rng = np.random.RandomState(1)
    pose = rng.randn(4, POSE_DIM).astype(np.float32) * 0.4
    out = np.asarray(prior(jnp.asarray(pose)))

    # independent numpy oracle of merged_log_likelihood (`prior.py:179-195`)
    precs = np.stack([np.linalg.inv(c) for c in gmm["covars"]])
    sqrdets = np.sqrt([np.linalg.det(c) for c in gmm["covars"]])
    const = (2 * math.pi) ** (POSE_DIM / 2.0)
    nll_w = gmm["weights"] / (const * (sqrdets / sqrdets.min()))
    diff = pose[:, None] - gmm["means"][None]
    quad = np.einsum("bkj,kji,bki->bk", diff, precs, diff)
    expect = np.min(0.5 * quad - np.log(nll_w)[None], axis=1)
    np.testing.assert_allclose(out, expect, rtol=1e-4)


def test_fallback_is_standard_normal():
    prior = MaxMixturePrior(None)
    assert prior.is_fallback
    pose = np.zeros((2, POSE_DIM), np.float32)
    pose[1, 0] = 2.0
    out = np.asarray(prior(jnp.asarray(pose)))
    # quadratic in the pose, const offset from the (2 pi)^(D/2) weight term
    np.testing.assert_allclose(out[1] - out[0], 0.5 * 4.0, atol=1e-4)
    assert out[1] > out[0]


def test_directory_path_resolution(tmp_path):
    gmm = _fake_gmm(K=2, seed=2)
    with open(tmp_path / "gmm_02.pkl", "wb") as f:
        pickle.dump(gmm, f)
    prior = MaxMixturePrior(str(tmp_path), num_gaussians=2)
    assert not prior.is_fallback
    assert prior.means.shape == (2, POSE_DIM)
