"""End-to-end preprocessing-tool test: synthesize reference-layout raw
recordings, run the tool, and load the result through EgoBodyDataModule."""

import os
import subprocess
import sys

import numpy as np

from seeme_tpu.config.loader import Config
from seeme_tpu.data import EgoBodyDataModule, validate_batch


def make_raw_recording(n_frames, seed=0):
    rng = np.random.RandomState(seed)

    def actor():
        return {
            "global_orient": rng.randn(n_frames, 1, 3).astype(np.float32) * 0.3,
            "body_pose": rng.randn(n_frames, 1, 69).astype(np.float32) * 0.3,
            "transl": rng.randn(n_frames, 1, 3).astype(np.float32),
            "betas": rng.randn(n_frames, 1, 10).astype(np.float32) * 0.5,
        }

    return {
        "video": "recording",
        "recording_utils": {
            "fx": np.full((n_frames,), 1.2, np.float32),
            "cx": np.full((n_frames,), 0.5, np.float32),
            "cy": np.full((n_frames,), 0.4, np.float32),
        },
        "wearer": actor(),
        "interactee": actor(),
    }


def test_preprocess_roundtrip(tmp_path):
    root = tmp_path / "EgoBody"
    for split, n_recs, frames in (("train", 3, 130), ("val", 1, 70), ("test", 1, 65)):
        d = root / "raw" / split
        d.mkdir(parents=True)
        for i in range(n_recs):
            np.save(d / f"rec_{i}.npy", make_raw_recording(frames, seed=i))

    result = subprocess.run(
        [sys.executable, "tools/preprocess_egobody.py", "--root", str(root),
         "--motion-length", "60"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert result.returncode == 0, result.stderr

    proc = root / "processed"
    assert (proc / "mean.npy").exists() and (proc / "train.npz").exists()
    mean = np.load(proc / "mean.npy")
    assert mean.shape == (1, 75)

    # train: 3 recs x 130 frames -> 3 x (60 + 60 + pad(10)) = 9 windows
    data = dict(np.load(proc / "train.npz"))
    assert data["feats"].shape == (9, 60, 2, 72)
    assert data["transl"].shape == (9, 2, 60, 3)
    assert sorted(set(data["length"].tolist())) == [10, 60]

    # normalized stats ~ N(0,1) over valid frames
    rows = []
    for i in range(len(data["feats"])):
        L = data["length"][i]
        rows.append(data["feats"][i, :L].reshape(-1, 72))
    flat = np.concatenate(rows)
    assert abs(flat.mean()) < 0.05
    assert abs(flat.std() - 1.0) < 0.05

    # loads through the datamodule with the batch contract
    cfg = Config({"DATASET_NAME": "egobody", "DEBUG": False})
    dm = EgoBodyDataModule(cfg, str(root))
    batch = next(dm.batches("train", 4, shuffle=False))
    validate_batch(batch, pose_feats=72, motion_length=60)
    # padded window appears with its true length
    assert batch["length"].dtype == np.int32


def test_preprocess_rot6d(tmp_path):
    """--data-type rot6d: 144-d diffusion-layout features + 147-d stats
    (the compute_mean_std.py rot6d contract)."""
    root = tmp_path / "EgoBody6d"
    d = root / "raw" / "train"
    d.mkdir(parents=True)
    np.save(d / "rec_0.npy", make_raw_recording(120, seed=7))

    result = subprocess.run(
        [sys.executable, "tools/preprocess_egobody.py", "--root", str(root),
         "--motion-length", "60", "--data-type", "rot6d"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert result.returncode == 0, result.stderr

    proc = root / "processed"
    mean = np.load(proc / "mean.npy")
    assert mean.shape == (1, 147)  # 24 joints x 6 + transl(3)
    data = dict(np.load(proc / "train.npz"))
    assert data["feats"].shape == (2, 60, 2, 144)

    # un-normalize one frame and check each 6d block is two orthonormal
    # columns of a rotation (diffusion layout: (3,2) flattened row-major)
    std = np.load(proc / "std.npy")
    f = data["feats"][0, 0, 0] * std[0, :144] + mean[0, :144]
    blocks = f.reshape(24, 3, 2)
    for b in blocks:
        np.testing.assert_allclose(b.T @ b, np.eye(2), atol=1e-4)


def test_preprocess_condition_variants(tmp_path):
    """EgoHMR predicted-interactee, EgoEgo wearer root, and image-crop
    variants (`dataset.py:1215-1228, 1300-1367, 1657-1745`) flow through the
    preprocessor into optional npz keys and the datamodule batch."""
    import pickle

    from PIL import Image

    root = tmp_path / "EgoBodyVar"
    rng = np.random.RandomState(3)
    n_frames = 70
    rec = make_raw_recording(n_frames, seed=3)
    imgnames = [f"img/frame_{i:05d}.jpg" for i in range(n_frames)]
    rec["recording_utils"]["original_imgname"] = imgnames
    rec["recording_utils"]["center"] = rng.rand(n_frames, 2).astype(np.float32) * 100 + 100
    rec["recording_utils"]["scale"] = np.full((n_frames,), 0.8, np.float32)
    for split in ("train", "test"):
        d = root / "raw" / split
        d.mkdir(parents=True)
        np.save(d / "rec_0.npy", rec)

    # fake image tree
    img_root = tmp_path / "images"
    (img_root / "img").mkdir(parents=True)
    for i in range(n_frames):
        arr = (rng.rand(360, 480, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_root / imgnames[i])

    # EgoHMR predicted interactee: constant recognizable pose
    interactee_pred = {
        img: {"smpl_parameters": {
            "global_orient": np.full((1, 3), 0.25, np.float32),
            "body_pose": np.full((1, 69), 0.5, np.float32),
            "betas": np.full((1, 10), 0.125, np.float32),
        }} for img in imgnames
    }
    with open(tmp_path / "interactee.pkl", "wb") as f:
        pickle.dump(interactee_pred, f)

    # EgoEgo predictions with gaps (carry-forward path)
    egoego = {
        img: {"transl": np.float32([0.1, 0.2, 0.3]) * (i + 1),
              "global_orient": np.eye(3, dtype=np.float32)}
        for i, img in enumerate(imgnames) if i % 3 != 2
    }
    with open(tmp_path / "egoego.pkl", "wb") as f:
        pickle.dump(egoego, f)

    result = subprocess.run(
        [sys.executable, "tools/preprocess_egobody.py", "--root", str(root),
         "--motion-length", "60",
         "--interactee-pred", str(tmp_path / "interactee.pkl"),
         "--egoego-pred", str(tmp_path / "egoego.pkl"),
         "--images-root", str(img_root), "--crops-per-window", "2"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert result.returncode == 0, result.stderr

    data = dict(np.load(root / "processed" / "train.npz"))
    assert data["egoego_transl"].shape == (2, 60, 3)
    assert data["egoego_orient"].shape == (2, 60, 3)
    assert data["image_crops"].shape == (2, 2, 224, 224, 3)
    assert data["image_crops"].dtype == np.uint8
    # identity rotmats -> zero axis-angle; carry-forward fills the gaps
    np.testing.assert_allclose(data["egoego_orient"][0, :10], 0.0, atol=1e-6)
    L0 = int(data["length"][0])
    assert L0 == 60 and np.all(np.abs(data["egoego_transl"][0, :L0]).sum(-1) > 0)

    # interactee (actor 1) features are the constant predicted pose once
    # un-normalized; wearer (actor 0) stays GT
    mean = np.load(root / "processed" / "mean.npy")[0]
    std = np.load(root / "processed" / "std.npy")[0]
    f_int = data["feats"][0, 0, 1] * std[:72] + mean[:72]
    np.testing.assert_allclose(f_int[:3], 0.25, atol=1e-4)
    np.testing.assert_allclose(f_int[3:], 0.5, atol=1e-4)

    # datamodule samples + ImageNet-normalizes one crop per item
    from seeme_tpu.config.loader import Config as Cfg
    dm = EgoBodyDataModule(Cfg({"DATASET_NAME": "egobody", "DEBUG": False}), str(root))
    batch = next(dm.batches("train", 2, shuffle=False))
    assert batch["image"].shape == (2, 224, 224, 3)
    assert batch["image"].dtype == np.float32
    assert "image_crops" not in batch
    assert -3.0 < batch["image"].mean() < 3.0


def test_scene_preprocess_cores(tmp_path):
    """Pure geometric cores of the EgoHMR scene preprocessing
    (`EgoHMR/preprocess_scene_s1.py:94-119`, `preprocess_scene_s2_for_train
    .py:135-190`)."""
    import sys

    sys.path.insert(0, "tools")
    from preprocess_scene_egohmr import (
        ADD_TRANS,
        apply_transform,
        crop_scene_cube_around_body,
        front_crop,
        load_obj_vertices,
        uniform_downsample,
    )

    # OBJ vertex parsing
    obj = tmp_path / "scene.obj"
    obj.write_text("# c\nv 1 2 3\nvn 0 0 1\nv 4.5 -1 0.25\nf 1 2 1\n")
    v = load_obj_vertices(str(obj))
    np.testing.assert_allclose(v, [[1, 2, 3], [4.5, -1, 0.25]])

    # homogeneous transform round trip
    rng = np.random.RandomState(0)
    verts = rng.randn(200, 3)
    T = np.eye(4)
    T[:3, :3] = np.linalg.qr(rng.randn(3, 3))[0]
    T[:3, 3] = [0.3, -0.2, 1.5]
    back = apply_transform(apply_transform(verts, T), np.linalg.inv(T))
    np.testing.assert_allclose(back, verts, atol=1e-10)
    # the opengl flip is an involution
    np.testing.assert_allclose(
        apply_transform(apply_transform(verts, ADD_TRANS), ADD_TRANS), verts)

    # front crop keeps only z > 0
    fc = front_crop(verts)
    assert (fc[:, 2] > 0).all() and len(fc) == (verts[:, 2] > 0).sum()

    # uniform downsample: exact target count, subset semantics
    down = uniform_downsample(verts, 50)
    assert down.shape == (50, 3)
    down_up = uniform_downsample(verts[:10], 32)  # tiles when under target
    assert down_up.shape == (32, 3)

    # body cube crop: fixed count, all points within cube_size of the body
    # center in xz after accounting for the bounded shift
    body = rng.randn(100, 3) * 0.2
    scene = rng.randn(5000, 3) * 3.0
    out, angle, shift = crop_scene_cube_around_body(
        scene, body, cube_size=2.0, target=256, rng=np.random.RandomState(1))
    assert out.shape == (256, 3)
    center = body.mean(0)
    # rotate forward again to check the cube bounds (crop was in aug frame)
    dx = out[:, 0] - center[0]
    dz = out[:, 2] - center[2]
    rx = dx * np.cos(angle) - dz * np.sin(angle)
    rz = dx * np.sin(angle) + dz * np.cos(angle)
    assert (np.abs(rx - shift[0]) <= 1.0 + 1e-9).all()
    assert (np.abs(rz - shift[2]) <= 1.0 + 1e-9).all()
    # no augmentation -> deterministic, zero rotation
    out2, angle2, shift2 = crop_scene_cube_around_body(
        scene, body, cube_size=2.0, target=256, augment=False)
    assert angle2 == 0.0 and (shift2 == 0).all()
