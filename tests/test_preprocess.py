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
