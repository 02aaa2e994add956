"""process_file (raw joints -> RIC features) round-trip tests.

The inverse path `core/ric.py::recover_from_ric` predates this module and is
itself parity-tested; recovering the features produced by `process_file` must
reproduce the canonicalized global joint positions — the same check the
reference pipeline runs when it writes `new_joints` next to `new_joint_vecs`
(`motion_process.py:466-470`)."""

import numpy as np
import pytest

from seeme_tpu.core.motion_process import (
    HUMANML3D,
    KIT,
    forward_kinematics,
    get_offsets_joints,
    inverse_kinematics,
    process_file,
    qfix,
    qmul,
    qnormalize,
    qrot,
    uniform_skeleton,
)


def _synthetic_motion(spec, T=24, seed=0, scale=1.0):
    """Plausible joint sequences: FK of the canonical skeleton from smoothly
    varying small random joint rotations + a drifting root."""
    rng = np.random.RandomState(seed)
    offsets = np.asarray(spec.raw_offsets, np.float64) * scale
    # bone lengths vary per joint
    lengths = 0.3 + 0.4 * rng.rand(spec.joints_num, 1)
    offsets = offsets * lengths

    aa = rng.randn(T, spec.joints_num, 3) * 0.08
    aa = np.cumsum(aa, axis=0) * 0.3  # smooth drift
    angle = np.linalg.norm(aa, axis=-1, keepdims=True) + 1e-9
    quat = np.concatenate(
        [np.cos(angle / 2), np.sin(angle / 2) * aa / angle], axis=-1)
    root = np.cumsum(rng.randn(T, 3) * 0.02, axis=0)
    root[:, 1] += 0.9
    joints = forward_kinematics(quat, root, offsets, spec)
    return joints


@pytest.mark.parametrize("spec,nfeats", [(HUMANML3D, 263), (KIT, 251)])
def test_process_file_shape(spec, nfeats):
    joints = _synthetic_motion(spec, T=20, seed=1)
    data, glob, local, l_vel = process_file(joints, spec)
    assert data.shape == (19, nfeats)
    assert glob.shape == (20, spec.joints_num, 3)
    assert np.isfinite(data).all()


def test_recover_from_ric_roundtrip():
    """features -> recover_from_ric reproduces the canonicalized globals."""
    import jax.numpy as jnp

    from seeme_tpu.core.ric import recover_from_ric

    spec = HUMANML3D
    joints = _synthetic_motion(spec, T=30, seed=2)
    data, glob, _, _ = process_file(joints, spec)
    rec = np.asarray(
        recover_from_ric(jnp.asarray(data, jnp.float32), spec.joints_num))
    # recovery integrates root rotation/translation from velocities; small
    # accumulation error is expected, fp32 vs fp64
    np.testing.assert_allclose(rec, glob[:-1], atol=5e-3)


def test_ik_fk_roundtrip():
    spec = HUMANML3D
    joints = _synthetic_motion(spec, T=12, seed=3)
    quat = inverse_kinematics(joints, spec)
    offsets = get_offsets_joints(joints[0], spec)
    rebuilt = forward_kinematics(qfix(quat), joints[:, 0], offsets, spec)
    np.testing.assert_allclose(rebuilt, joints, atol=1e-6)


def test_uniform_skeleton_retargets_bone_lengths():
    spec = HUMANML3D
    joints = _synthetic_motion(spec, T=8, seed=4)
    target = _synthetic_motion(spec, T=2, seed=5, scale=1.5)
    tgt_offsets = get_offsets_joints(target[0], spec)
    out = uniform_skeleton(joints, tgt_offsets, spec)
    got = get_offsets_joints(out[0], spec)
    np.testing.assert_allclose(
        np.linalg.norm(got[1:], axis=-1),
        np.linalg.norm(tgt_offsets[1:], axis=-1), rtol=1e-5)


def test_quaternion_helpers():
    rng = np.random.RandomState(0)
    q = qnormalize(rng.randn(5, 4))
    v = rng.randn(5, 3)
    # rotation preserves norms; qmul composes
    np.testing.assert_allclose(
        np.linalg.norm(qrot(q, v), axis=-1), np.linalg.norm(v, axis=-1),
        rtol=1e-10)
    q2 = qnormalize(rng.randn(5, 4))
    np.testing.assert_allclose(
        qrot(qmul(q, q2), v), qrot(q, qrot(q2, v)), atol=1e-10)
