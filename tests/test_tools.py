"""Tool tests: render backend, SMPLify fitting convergence."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from seeme_tpu.core import smpl_forward, synthetic_smpl
from seeme_tpu.core.smpl import smpl_joints24
from seeme_tpu.render.joints import render_joints_video


import pytest

# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


def test_render_joints_video(tmp_path):
    rng = np.random.RandomState(0)
    joints = np.cumsum(rng.randn(6, 24, 3).astype(np.float32) * 0.02, axis=0)
    out = render_joints_video(joints, str(tmp_path / "clip.gif"), fps=4)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000


def test_smplify_fits_known_pose():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fit import fit_smpl_to_joints

    smpl = synthetic_smpl(n_verts=128)
    rng = np.random.RandomState(0)
    true_pose = jnp.asarray(rng.randn(2, 69).astype(np.float32) * 0.2)
    true_go = jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.2)
    true_transl = jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.5)
    target = smpl_joints24(smpl, jnp.zeros((2, 10)), true_pose, true_go, true_transl)

    params, terms = fit_smpl_to_joints(smpl, target, num_steps=400, lr=0.03)
    fitted = smpl_joints24(
        smpl, jnp.broadcast_to(params["betas"], (2, 10)),
        params["body_pose"], params["global_orient"], params["transl"],
    )
    err = float(jnp.linalg.norm(fitted - target, axis=-1).mean())
    assert err < 0.03, err  # < 3cm mean joint error on the synthetic model


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_render_pairs_overlay(tmp_path):
    """render.py --pairs renders pred_*.npy with the matching gt overlay and
    degrades to pred-only when the gt file is absent."""
    rng = np.random.RandomState(0)
    for i in range(2):
        np.save(tmp_path / f"pred_{i}.npy", rng.randn(4, 24, 3).astype(np.float32) * 0.2)
    np.save(tmp_path / "gt_0.npy", rng.randn(4, 24, 3).astype(np.float32) * 0.2)

    result = subprocess.run(
        [sys.executable, "render.py", "--dir", str(tmp_path), "--pairs",
         "--out", str(tmp_path / "out")],
        capture_output=True, text=True, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr
    assert "(+gt overlay)" in result.stdout
    assert (tmp_path / "out" / "pred_0.gif").exists()
    assert (tmp_path / "out" / "pred_1.gif").exists()


def test_gltf_export_roundtrip(tmp_path):
    """GLB export: valid container, accessor counts, animation channels
    (the fbx_output.py role, SDK-free)."""
    import sys

    sys.path.insert(0, "scripts")
    import numpy as np
    from export_gltf import build_glb, parse_glb

    rng = np.random.RandomState(0)
    joints = rng.randn(12, 24, 3).astype(np.float32)
    glb = build_glb(joints, fps=20.0)
    doc = parse_glb(glb)
    assert doc["asset"]["version"] == "2.0"
    assert len(doc["nodes"]) == 24
    anim = doc["animations"][0]
    assert len(anim["channels"]) == 24
    assert all(c["target"]["path"] == "translation" for c in anim["channels"])
    # time accessor covers all frames at the right rate
    t_acc = doc["accessors"][anim["samplers"][0]["input"]]
    assert t_acc["count"] == 12
    assert abs(t_acc["max"][0] - 11 / 20.0) < 1e-6
    # per-joint output accessors are VEC3 with T entries
    out_acc = doc["accessors"][anim["samplers"][3]["output"]]
    assert out_acc["type"] == "VEC3" and out_acc["count"] == 12
    # binary chunk decodes back to the joint track
    import struct
    json_len = struct.unpack_from("<II", glb, 12)[0]
    bin_start = 20 + json_len + 8
    bv = doc["bufferViews"][out_acc["bufferView"]]
    raw = glb[bin_start + bv["byteOffset"]:
              bin_start + bv["byteOffset"] + bv["byteLength"]]
    track = np.frombuffer(raw, np.float32).reshape(12, 3)
    np.testing.assert_allclose(track, joints[:, 3], atol=1e-6)


def test_export_obj_roundtrip(tmp_path):
    """OBJ export (`results_ours_gimo/compute_trimesh.py` role): dict-npy
    input reshapes to (N, T, V, 3) sequences and each frame file parses back
    to the source vertices and 1-based faces."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "export_obj", os.path.join(os.path.dirname(__file__), "..",
                                   "scripts", "export_obj.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)
    verts = rng.randn(8, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]])
    path = tmp_path / "mesh.obj"
    mod.write_obj(str(path), verts, faces)
    lines = path.read_text().splitlines()
    vs = np.array([[float(x) for x in l.split()[1:]]
                   for l in lines if l.startswith("v ")])
    fs = np.array([[int(x) for x in l.split()[1:]]
                   for l in lines if l.startswith("f ")])
    np.testing.assert_allclose(vs, verts, atol=1e-5)
    np.testing.assert_array_equal(fs, faces + 1)


@pytest.mark.slow
def test_demo_text_example_mode(tmp_path):
    """demo.py drives text-to-motion sampling from an --example captions
    file (reference `demo.py:47-52` + `demo_utils.py:6-20`)."""
    cap = tmp_path / "captions.txt"
    cap.write_text("24 a person walks forward\n20 a person sits down\n")
    out = tmp_path / "out"
    result = subprocess.run(
        [sys.executable, "demo.py", "--cfg",
         "configs/config_mld_humanml3d.yaml", "--example", str(cap),
         "--out", str(out), "--cpu"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr
    assert (out / "sample_0.npy").exists()
    assert (out / "sample_1.npy").exists()
    assert (out / "captions.txt").read_text().startswith("24 a person walks")
    j0 = np.load(out / "sample_0.npy")
    assert j0.shape == (24, 22, 3)  # trimmed to the requested length
    j1 = np.load(out / "sample_1.npy")
    assert j1.shape == (20, 22, 3)


@pytest.mark.slow
def test_demo_reconstruction_and_action_modes(tmp_path):
    """demo.py --task reconstruction round-trips test motions; action
    configs dispatch to class-conditional sampling."""
    out = tmp_path / "rec"
    result = subprocess.run(
        [sys.executable, "demo.py", "--cfg",
         "configs/config_mld_humanml3d.yaml", "--task", "reconstruction",
         "--num_samples", "2", "--out", str(out), "--cpu"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr
    assert (out / "rec_0.npy").exists() and (out / "gt_1.npy").exists()

    out2 = tmp_path / "a2m"
    result = subprocess.run(
        [sys.executable, "demo.py", "--cfg",
         "configs/config_mld_humanact12.yaml", "--actions", "0,3",
         "--out", str(out2), "--cpu"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr
    a0 = np.load(out2 / "action_0.npy")
    assert a0.ndim == 3 and a0.shape[1:] == (24, 3)
    assert (out2 / "action_3.npy").exists()


def test_export_fbx_fallback_paths(tmp_path):
    """export_fbx.py (`scripts/fbx_output.py` role): without bpy it writes
    the documented OBJ-sequence / glb fallbacks; the bpy builders are
    exercised where Blender's Python runs this repo."""
    np.save(tmp_path / "mesh.npy", np.random.RandomState(0)
            .randn(3, 40, 3).astype(np.float32))
    np.save(tmp_path / "faces.npy", np.array([[0, 1, 2], [3, 4, 5]]))
    np.save(tmp_path / "joints.npy", np.random.RandomState(1)
            .randn(4, 24, 3).astype(np.float32))

    r = subprocess.run(
        [sys.executable, "scripts/export_fbx.py", "--mesh",
         str(tmp_path / "mesh.npy"), "--faces", str(tmp_path / "faces.npy"),
         "--out", str(tmp_path / "a.fbx")],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    try:
        import bpy  # noqa: F401

        assert (tmp_path / "a.fbx").exists()
    except ImportError:
        assert (tmp_path / "a_obj" / "frame_0000.obj").exists()

    r = subprocess.run(
        [sys.executable, "scripts/export_fbx.py", "--joints",
         str(tmp_path / "joints.npy"), "--out", str(tmp_path / "b.fbx")],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "b.fbx").exists() or (tmp_path / "b.glb").exists()


@pytest.mark.slow
def test_train_evaluator_a2m(tmp_path):
    """Natively trained a2m GRU evaluator (tools/train_evaluator.py) learns
    the shared-across-splits class signatures: val accuracy far above the
    1/12 chance after a few epochs, and the checkpoint loads back through
    test.py's TEST.EVALUATOR_CHECKPOINT restore path."""
    out = tmp_path / "gru"
    r = subprocess.run(
        [sys.executable, "tools/train_evaluator.py", "--cfg",
         "configs/config_mld_humanact12.yaml", "--cpu", "--epochs", "12",
         "--out", str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    import re

    accs = re.findall(r"val_acc=([0-9.]+)", r.stdout + r.stderr)
    assert accs and float(accs[-1]) > 0.3, (accs, r.stderr[-500:])

    from seeme_tpu.train.checkpoint import restore_params
    from seeme_tpu.eval import MotionDiscriminator

    clf = MotionDiscriminator(hidden_size=128, num_layers=2, output_size=12)
    template = clf.init(
        __import__("jax").random.PRNGKey(0), jnp.zeros((1, 60, 72)),
        jnp.ones((1,), jnp.int32))
    restored = restore_params(str(out), template)
    assert set(restored) == set(template)


@pytest.mark.slow
def test_train_evaluator_t2m(tmp_path):
    """The contrastive TM2T-evaluator trainer writes the text/move/motion
    checkpoint layout and reaches retrieval far above the 1/32 chance on the
    val pools (label-correlated synthetic captions; duplicate captions cap
    R@1 well below 1.0)."""
    out = tmp_path / "t2m"
    r = subprocess.run(
        [sys.executable, "tools/train_evaluator.py", "--cfg",
         "configs/config_mld_humanml3d.yaml", "--cpu", "--debug",
         "--epochs", "150", "--out", str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    import re

    accs = re.findall(r"R@1\(32\)=([0-9.]+)", r.stdout + r.stderr)
    assert accs and float(accs[-1]) > 0.15, (accs, r.stderr[-500:])
    for sub in ("text", "move", "motion"):
        assert (out / sub).exists()
