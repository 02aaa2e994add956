"""Ego metric tests: vectorized values vs an independent per-sequence numpy
reimplementation of the reference loops (`compute.py:441-517`)."""

import jax.numpy as jnp
import numpy as np

from seeme_tpu.core import aa_to_quat
from seeme_tpu.eval import EgoMetric, ego_sequence_metrics, get_metric_statistics
from seeme_tpu.eval.metrics import interactee_mpjpe


def quat_to_mat_np(q):
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def reference_metrics_numpy(jts_pred, jts_gt, quat_pred, quat_gt, lengths):
    """Literal port of the reference's per-sequence loop semantics."""
    B, T = jts_pred.shape[:2]
    out = {"mpjpe": [], "root_err": [], "head_err": [], "accl": []}
    # start alignment (head joint 15, frame 0)
    jts_gt = jts_gt - jts_gt[:, 0:1, 15:16]
    jts_pred = jts_pred - jts_pred[:, 0:1, 15:16]
    pelvis_gt = jts_gt[:, :, 0]
    pelvis_pred = jts_pred[:, :, 0]
    a_gt = jts_gt - jts_gt[:, :, 0:1]
    a_pred = jts_pred - jts_pred[:, :, 0:1]
    for b in range(B):
        L = lengths[b]
        out["mpjpe"].append(
            np.linalg.norm(a_pred[b, :L] - a_gt[b, :L], axis=-1).mean() * 1000
        )
        out["root_err"].append(
            np.linalg.norm(pelvis_gt[b, :L] - pelvis_pred[b, :L], axis=-1).mean() * 1000
        )
        Rg = quat_to_mat_np(quat_gt[b, :L])
        Rp = quat_to_mat_np(quat_pred[b, :L])
        frob = [
            np.linalg.norm(np.eye(3) - Rg[t] @ np.linalg.inv(Rp[t]), "fro")
            for t in range(L)
        ]
        out["head_err"].append(np.mean(frob))
        ag = jts_gt[b, :L]
        ap = jts_pred[b, :L]
        accel_g = ag[:-2] - 2 * ag[1:-1] + ag[2:]
        accel_p = ap[:-2] - 2 * ap[1:-1] + ap[2:]
        out["accl"].append(
            np.linalg.norm(accel_p - accel_g, axis=2).mean() * 1000
        )
    return {k: np.array(v) for k, v in out.items()}


def make_data(B=4, T=20, seed=0):
    rng = np.random.RandomState(seed)
    jts_gt = rng.randn(B, T, 24, 3).astype(np.float32) * 0.2
    jts_pred = jts_gt + rng.randn(B, T, 24, 3).astype(np.float32) * 0.05
    aa_gt = rng.randn(B, T, 3).astype(np.float32) * 0.5
    aa_pred = aa_gt + rng.randn(B, T, 3).astype(np.float32) * 0.1
    quat_gt = np.asarray(aa_to_quat(jnp.asarray(aa_gt)))
    quat_pred = np.asarray(aa_to_quat(jnp.asarray(aa_pred)))
    return jts_pred, jts_gt, quat_pred, quat_gt


class TestVectorizedParity:
    def test_full_length(self):
        jts_pred, jts_gt, quat_pred, quat_gt = make_data()
        lengths = np.array([20, 20, 20, 20])
        mask = np.arange(20)[None] < lengths[:, None]
        ours = ego_sequence_metrics(
            jnp.asarray(jts_pred), jnp.asarray(jts_gt),
            jnp.asarray(quat_pred), jnp.asarray(quat_gt), jnp.asarray(mask),
        )
        ref = reference_metrics_numpy(jts_pred, jts_gt, quat_pred, quat_gt, lengths)
        for k in ref:
            np.testing.assert_allclose(np.asarray(ours[k]), ref[k], rtol=1e-3, err_msg=k)

    def test_variable_lengths(self):
        jts_pred, jts_gt, quat_pred, quat_gt = make_data(seed=1)
        lengths = np.array([20, 12, 7, 16])
        mask = np.arange(20)[None] < lengths[:, None]
        ours = ego_sequence_metrics(
            jnp.asarray(jts_pred), jnp.asarray(jts_gt),
            jnp.asarray(quat_pred), jnp.asarray(quat_gt), jnp.asarray(mask),
        )
        ref = reference_metrics_numpy(jts_pred, jts_gt, quat_pred, quat_gt, lengths)
        for k in ref:
            np.testing.assert_allclose(np.asarray(ours[k]), ref[k], rtol=1e-3, err_msg=k)

    def test_perfect_prediction_zeroes_errors(self):
        jts_pred, jts_gt, quat_pred, quat_gt = make_data(seed=2)
        mask = np.ones((4, 20), bool)
        ours = ego_sequence_metrics(
            jnp.asarray(jts_gt), jnp.asarray(jts_gt),
            jnp.asarray(quat_gt), jnp.asarray(quat_gt), jnp.asarray(mask),
        )
        for k in ("mpjpe", "root_err", "accl"):
            np.testing.assert_allclose(np.asarray(ours[k]), 0.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(ours["head_err"]), 0.0, atol=1e-2)


class TestFilterSemantics:
    def test_test_split_filter(self):
        # construct one good and one terrible sequence; the terrible one must
        # be excluded on the test split (head_err<0.9 & root_err<300,
        # compute.py:494)
        jts_pred, jts_gt, quat_pred, quat_gt = make_data(seed=3)
        bad_pred = jts_pred.copy()
        bad_pred[1] += np.linspace(0, 5, 20)[:, None, None]  # drifting root
        bad_quat = quat_pred.copy()
        bad_quat[1] = np.roll(quat_gt[1], 2, axis=-1)  # wildly wrong orientation
        mask = np.ones((4, 20), bool)
        m = EgoMetric(split="test")
        m.update(jnp.asarray(bad_pred), jnp.asarray(jts_gt),
                 jnp.asarray(bad_quat), jnp.asarray(quat_gt), jnp.asarray(mask))
        assert m.counts["MPJPE"] < 4
        val = m.compute()
        assert np.isfinite(val["MPJPE"])

    def test_val_split_no_filter(self):
        jts_pred, jts_gt, quat_pred, quat_gt = make_data(seed=4)
        mask = np.ones((4, 20), bool)
        m = EgoMetric(split="val")
        m.update(jnp.asarray(jts_pred), jnp.asarray(jts_gt),
                 jnp.asarray(quat_pred), jnp.asarray(quat_gt), jnp.asarray(mask))
        assert m.counts["MPJPE"] == 4

    def test_interactee_mpjpe(self):
        jts_pred, jts_gt, _, _ = make_data(seed=5)
        mask = np.ones((4, 20), bool)
        v = interactee_mpjpe(jnp.asarray(jts_pred), jnp.asarray(jts_gt), jnp.asarray(mask))
        assert v.shape == (4,)
        v0 = interactee_mpjpe(jnp.asarray(jts_gt), jnp.asarray(jts_gt), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(v0), 0.0, atol=1e-4)


def test_replication_statistics():
    reps = [{"MPJPE": 100.0, "ACCL": 5.0}, {"MPJPE": 110.0, "ACCL": 7.0}]
    stats = get_metric_statistics(reps)
    assert stats["MPJPE"]["mean"] == 105.0
    assert stats["MPJPE"]["min"] == 100.0 and stats["MPJPE"]["max"] == 110.0
    expected_ci = 1.96 * np.std([100, 110]) / np.sqrt(2)
    np.testing.assert_allclose(stats["MPJPE"]["conf_interval"], expected_ci, rtol=1e-6)


class TestActionMetrics:
    def test_action_metrics(self):
        from seeme_tpu.eval.action_metrics import ActionMetrics

        rng = np.random.RandomState(0)
        n, C, D = 40, 5, 16
        labels = rng.randint(0, C, n)
        feats = rng.randn(n, D).astype(np.float32) + labels[:, None]
        logits = np.eye(C)[labels] * 10.0  # perfect classifier
        m = ActionMetrics(num_classes=C)
        m.update(feats, feats, logits, labels)
        res = m.compute()
        assert res["accuracy"] == 1.0
        assert res["FID"] < 1e-6
        assert res["Diversity"] > 0 and "MultiModality" in res

    def test_uncond_metrics(self):
        from seeme_tpu.eval.action_metrics import UncondMetrics

        rng = np.random.RandomState(1)
        gt = rng.randn(64, 8)
        gen_close = gt + rng.randn(64, 8) * 0.01
        gen_far = gt + 5.0
        m1, m2 = UncondMetrics(), UncondMetrics()
        m1.update(gen_close, gt)
        m2.update(gen_far, gt)
        assert m1.compute()["FID"] < m2.compute()["FID"]


class TestRifkeApeAve:
    def test_rifke_roundtrip(self):
        """forward -> inverse recovers joints up to global yaw/XZ origin
        (the transform is rotation/translation invariant by design)."""
        import jax.numpy as jnp

        from seeme_tpu.core.rifke import joints_to_rifke, rifke_to_joints

        rng = np.random.RandomState(0)
        T = 12
        joints = rng.randn(T, 22, 3).astype(np.float32) * 0.3
        joints[:, :, 1] += 1.0
        feats = joints_to_rifke(jnp.asarray(joints))
        assert feats.shape == (T, 1 + 21 * 3 + 1 + 2)
        rec = np.asarray(rifke_to_joints(feats))
        assert rec.shape == (T, 22, 3)
        # invariants preserved: root height (up to floor shift) and
        # root-relative pose distances
        d_orig = np.linalg.norm(joints[:, 1:] - joints[:, :1], axis=2)
        d_rec = np.linalg.norm(rec[:, 1:] - rec[:, :1], axis=2)
        np.testing.assert_allclose(d_rec, d_orig, atol=1e-4)

    def test_rifke_yaw_invariance(self):
        import jax.numpy as jnp

        from seeme_tpu.core.rifke import joints_to_rifke

        rng = np.random.RandomState(1)
        joints = rng.randn(8, 22, 3).astype(np.float32) * 0.3
        c, s = np.cos(0.7), np.sin(0.7)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
        rotated = joints @ R.T
        f1 = np.asarray(joints_to_rifke(jnp.asarray(joints)))
        f2 = np.asarray(joints_to_rifke(jnp.asarray(rotated)))
        # pose features (indices 1..-3) are yaw-invariant
        np.testing.assert_allclose(f1[:, 1:-3], f2[:, 1:-3], atol=1e-4)

    def test_ape_ave_zero_for_identical(self):
        from seeme_tpu.eval.ape_ave import ApeAveMetrics

        rng = np.random.RandomState(2)
        j = rng.randn(2, 10, 22, 3).astype(np.float32)
        m = ApeAveMetrics()
        m.update(j, j, [10, 10])
        res = m.compute()
        for k, v in res.items():
            assert v < 1e-5, (k, v)
        m2 = ApeAveMetrics()
        m2.update(j + 0.1, j, [10, 10])
        assert m2.compute()["APE_root"] > 0.05


def test_metric_compute_sync_single_process():
    """sync=True is the multi-host reduction path; single-process it must be
    an exact no-op on the means."""
    from seeme_tpu.eval import EgoMetric
    from seeme_tpu.parallel import allreduce_metric_sums

    m = EgoMetric(split="val")
    m._add("mpjpe", 2.0)
    m._add("mpjpe", 4.0)
    m._add("root_error", 1.0)
    assert m.compute(sync=True) == m.compute(sync=False) == {
        "mpjpe": 3.0, "root_error": 1.0,
    }
    sums, counts = allreduce_metric_sums(m.sums, m.counts)
    assert sums == {"mpjpe": 6.0, "root_error": 1.0}
    assert counts == {"mpjpe": 2, "root_error": 1}


def test_allreduce_metric_sums_two_hosts():
    """Simulate 2 processes: allreduce_metric_sums must sum the (sum, count)
    accumulators so both hosts compute identical means — the role of the
    reference's torchmetrics dist_reduce_fx='sum' (`compute.py:106-178`)."""
    from unittest import mock

    import numpy as np

    from seeme_tpu.parallel.mesh import allreduce_metric_sums

    host0 = ({"MPJPE": 100.0, "ACCL": 4.0}, {"MPJPE": 2, "ACCL": 2})
    host1 = ({"MPJPE": 50.0, "ACCL": 2.0}, {"MPJPE": 1, "ACCL": 1})
    keys = sorted(host0[0])
    vec1 = np.asarray([host1[0][k] for k in keys]
                      + [float(host1[1][k]) for k in keys], np.float32)

    def fake_allgather(vec):
        return np.stack([np.asarray(vec), vec1])

    with mock.patch("jax.process_count", return_value=2), \
         mock.patch("jax.experimental.multihost_utils.process_allgather",
                    side_effect=fake_allgather):
        sums, counts = allreduce_metric_sums(*host0)
    assert sums == {"ACCL": 6.0, "MPJPE": 150.0}
    assert counts == {"ACCL": 3, "MPJPE": 3}

    # and through EgoMetric.compute(sync=True): merged means
    from seeme_tpu.eval.metrics import EgoMetric

    m = EgoMetric(split="val", sums=dict(host0[0]), counts=dict(host0[1]))
    with mock.patch("jax.process_count", return_value=2), \
         mock.patch("jax.experimental.multihost_utils.process_allgather",
                    side_effect=fake_allgather):
        out = m.compute(sync=True)
    assert abs(out["MPJPE"] - 50.0) < 1e-6
    assert abs(out["ACCL"] - 2.0) < 1e-6
