#!/usr/bin/env python
"""EgoHMR scene preprocessing (stages s1 and s2).

Port of `EgoHMR/preprocess_scene_s1.py:1-140` and
`preprocess_scene_s2_for_{train,test}.py` without the open3d dependency:

  s1: per egocentric frame, transform the scene mesh vertices
      scene -> master-kinect -> holo -> PV camera (+ the opengl axis flip),
      keep vertices in front of the camera, uniform-downsample to a target
      count, transform back to the kinect frame, and write
      map_dict_{split}.pkl / pcd_verts_dict_{split}.pkl (cached every 15
      frames like the reference, `preprocess_scene_s1.py:74-78`).

  s2: crop a `cube_size` scene cube around the GT body (random yaw rotation
      about the body center + bounded random shift, height-limited to
      cube_size above the floor), downsample, rotate back, and write one
      npy per frame (`preprocess_scene_s2_for_train.py:135-200`).

The geometric cores are pure functions (OBJ vertex parsing, homogeneous
transforms, front crop, uniform downsample, body-cube crop) so they are
unit-testable without the EgoBody release; the CLI drivers are gated on the
release layout being present.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from typing import Optional, Tuple

import numpy as np

# egocentric camera is opengl-coordinate; kinect is opencv
# (`preprocess_scene_s1.py:53-57`)
ADD_TRANS = np.array([[1.0, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0],
                      [0, 0, 0, 1]])


def load_obj_vertices(path: str) -> np.ndarray:
    """Parse the `v x y z` lines of an OBJ file (replaces o3d mesh IO)."""
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return np.asarray(verts, np.float64)


def apply_transform(verts: np.ndarray, T: np.ndarray) -> np.ndarray:
    """(N, 3) through a homogeneous 4x4."""
    return verts @ T[:3, :3].T + T[:3, 3]


def front_crop(verts: np.ndarray) -> np.ndarray:
    """Keep vertices in front of the egocentric camera (z > 0 after the
    opengl flip, `preprocess_scene_s1.py:100-103`)."""
    return verts[verts[:, 2] > 0]


def uniform_downsample(verts: np.ndarray, target: int) -> np.ndarray:
    """o3d uniform_down_sample(every_k_points=n//target) then cap at target
    (`preprocess_scene_s1.py:106-114`); tiles when under target so the
    output shape is always (target, 3)."""
    n = len(verts)
    if n == 0:
        return np.zeros((target, 3), verts.dtype if len(verts) else np.float64)
    k = max(int(n / target), 1)
    out = verts[::k]
    if len(out) < target:
        out = out[np.resize(np.arange(len(out)), target)]
    return out[:target]


def _rot_xz(verts: np.ndarray, center: np.ndarray, angle: float) -> np.ndarray:
    """Rotate about the vertical (y) axis through `center`
    (`preprocess_scene_s2_for_train.py:140-151`)."""
    out = verts.copy()
    dx = verts[:, 0] - center[0]
    dz = verts[:, 2] - center[2]
    out[:, 0] = dx * np.cos(angle) - dz * np.sin(angle) + center[0]
    out[:, 2] = dx * np.sin(angle) + dz * np.cos(angle) + center[2]
    return out


def crop_scene_cube_around_body(
    scene_verts: np.ndarray,       # (N, 3), scene frame (y up)
    body_verts: np.ndarray,        # (V, 3), same frame
    cube_size: float = 2.0,
    target: int = 20000,
    rng: Optional[np.random.RandomState] = None,
    augment: bool = True,
) -> Tuple[np.ndarray, float, np.ndarray]:
    """The s2 body-centered cube crop
    (`preprocess_scene_s2_for_train.py:135-190`): random yaw about the body
    center, bounded random xz shift keeping the body inside the cube, crop,
    height limit, downsample, rotate back. Returns
    (verts (target, 3), rot_angle, shift)."""
    rng = rng or np.random.RandomState(0)
    center = body_verts.mean(axis=0)
    angle = rng.uniform(0, 2 * np.pi) if augment else 0.0
    scene_aug = _rot_xz(scene_verts, center, angle)
    body_aug = _rot_xz(body_verts, center, angle)

    shift = np.zeros(3)
    if augment:
        bmin, bmax = body_aug.min(0), body_aug.max(0)
        shift[0] = rng.uniform(
            max(-cube_size / 4, (bmax[0] - center[0]) - cube_size / 2),
            min(cube_size / 4, cube_size / 2 - (center[0] - bmin[0])))
        shift[2] = rng.uniform(
            max(-cube_size / 4, (bmax[2] - center[2]) - cube_size / 2),
            min(cube_size / 4, cube_size / 2 - (center[2] - bmin[2])))

    lo_x, hi_x = center[0] - cube_size / 2 + shift[0], center[0] + cube_size / 2 + shift[0]
    lo_z, hi_z = center[2] - cube_size / 2 + shift[2], center[2] + cube_size / 2 + shift[2]
    crop = scene_aug[(scene_aug[:, 0] >= lo_x) & (scene_aug[:, 0] <= hi_x)
                     & (scene_aug[:, 2] >= lo_z) & (scene_aug[:, 2] <= hi_z)]
    if len(crop):
        crop = crop[crop[:, 1] <= crop[:, 1].min() + cube_size]
    down = uniform_downsample(crop, target)
    return _rot_xz(down, center, -angle), angle, shift


# ---------------------------------------------------------------- s1 driver

def run_s1(data_root: str, save_root: str, split: str, target: int = 20000,
           cache_every: int = 15):
    import pandas as pd

    df = pd.read_csv(os.path.join(data_root, "data_info_release.csv"))
    scene_of = dict(zip(df["recording_name"], df["scene_name"]))
    data = np.load(os.path.join(
        data_root, f"smpl_spin_npz/egocapture_{split}_smpl.npz"))
    with open(os.path.join(data_root, "transf_matrices_all_seqs.pkl"), "rb") as f:
        transf = pickle.load(f)

    os.makedirs(save_root, exist_ok=True)
    mesh_cache = {}
    map_dict, pcd_dict = {}, {}
    last_scene, last_key = "", None
    for cnt, imgname in enumerate(data["imgname"]):
        rec = imgname.split("/")[-4]
        seq = imgname.split("/")[-3]
        scene = scene_of[rec]
        key = "/".join(imgname.split("/")[-5:]) if imgname.startswith("/") else imgname
        if cnt % cache_every == 0 or last_scene != scene:
            t_seq = transf[seq] if seq in transf else transf[rec]
            k2h = np.asarray(t_seq["trans_kinect2holo"], np.float64)
            frame_id = imgname.split("/")[-1][-15:-4]
            h2pv = np.asarray(t_seq["trans_world2pv"][frame_id], np.float64)
            if scene not in mesh_cache:
                mesh_cache[scene] = load_obj_vertices(os.path.join(
                    data_root, "scene_mesh", scene, f"{scene}.obj"))
            with open(os.path.join(data_root, "calibrations", rec,
                                   "cal_trans/kinect12_to_world",
                                   f"{scene}.json")) as f:
                scene2main = np.linalg.inv(np.asarray(json.load(f)["trans"]))
            v = apply_transform(mesh_cache[scene], scene2main)
            v = apply_transform(v, k2h)
            v = apply_transform(v, h2pv)
            v = apply_transform(v, ADD_TRANS)
            v = uniform_downsample(front_crop(v), target)
            # back to the kinect master frame (`preprocess_scene_s1.py:116-119`)
            v = apply_transform(v, np.linalg.inv(ADD_TRANS))
            v = apply_transform(v, np.linalg.inv(h2pv))
            v = apply_transform(v, np.linalg.inv(k2h))
            pcd_dict[key] = v
            last_key = key
        map_dict[key] = last_key
        last_scene = scene

    with open(os.path.join(save_root, f"map_dict_{split}.pkl"), "wb") as f:
        pickle.dump(map_dict, f, protocol=2)
    with open(os.path.join(save_root, f"pcd_verts_dict_{split}.pkl"), "wb") as f:
        pickle.dump(pcd_dict, f, protocol=2)
    print(f"s1 {split}: {len(pcd_dict)} cached pcds for {len(map_dict)} frames")


# ---------------------------------------------------------------- s2 driver

def run_s2(data_root: str, save_root: str, split: str, target: int = 20000,
           cube_size: float = 2.0, smpl_path: str = "", seed: int = 0):
    import sys

    import pandas as pd

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    try:  # offline host tool: never initialize the (possibly dead) TPU relay
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp

    from seeme_tpu.core.smpl import load_smpl, smpl_forward, synthetic_smpl

    smpl = load_smpl(smpl_path) if smpl_path and os.path.exists(smpl_path) \
        else synthetic_smpl(n_verts=6890)

    df = pd.read_csv(os.path.join(data_root, "data_info_release.csv"))
    scene_of = dict(zip(df["recording_name"], df["scene_name"]))
    data = np.load(os.path.join(
        data_root, f"smpl_spin_npz/egocapture_{split}_smpl.npz"))
    with open(os.path.join(data_root, "transf_matrices_all_seqs.pkl"), "rb") as f:
        transf = pickle.load(f)

    rng = np.random.RandomState(seed)
    mesh_cache = {}
    n_done = 0
    for i, imgname in enumerate(data["imgname"]):
        rec = imgname.split("/")[-4]
        seq = imgname.split("/")[-3]
        frame = imgname.split("/")[-1][:-4]
        scene = scene_of[rec]
        if scene not in mesh_cache:
            mesh_cache[scene] = load_obj_vertices(os.path.join(
                data_root, "scene_mesh", scene, f"{scene}.obj"))
        t_seq = transf[seq] if seq in transf else transf[rec]
        k2h = np.asarray(t_seq["trans_kinect2holo"], np.float64)
        h2pv = np.asarray(t_seq["trans_world2pv"][imgname.split("/")[-1][-15:-4]],
                          np.float64)
        with open(os.path.join(data_root, "calibrations", rec,
                               "cal_trans/kinect12_to_world",
                               f"{scene}.json")) as f:
            scene2main = np.linalg.inv(np.asarray(json.load(f)["trans"]))

        # GT body verts (PV frame) -> scene frame
        fk = smpl_forward(
            smpl, jnp.asarray(data["shape"][[i], :10]),
            jnp.asarray(data["pose"][[i], 3:72]),
            jnp.asarray(data["global_orient_pv"][[i]]),
            jnp.asarray(data["transl_pv"][[i]]))
        body = np.asarray(fk["vertices"][0], np.float64)
        for T in (ADD_TRANS, h2pv, k2h, scene2main):
            body = apply_transform(body, np.linalg.inv(T))

        verts, _, _ = crop_scene_cube_around_body(
            mesh_cache[scene], body, cube_size=cube_size, target=target,
            rng=rng, augment=split == "train")
        out_dir = os.path.join(save_root, split, rec, seq)
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, f"{frame}.npy"), verts.astype(np.float32))
        n_done += 1
    print(f"s2 {split}: wrote {n_done} cropped scene npys")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["s1", "s2"], required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--save_root", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--scene_verts_num_target", type=int, default=20000)
    ap.add_argument("--cube_size", type=float, default=2.0)
    ap.add_argument("--smpl_path", default="./deps/smpl_models/smpl/SMPL_NEUTRAL.pkl")
    args = ap.parse_args()

    if args.stage == "s1":
        run_s1(args.data_root, args.save_root, args.split,
               args.scene_verts_num_target)
    else:
        run_s2(args.data_root, args.save_root, args.split,
               args.scene_verts_num_target, args.cube_size, args.smpl_path)


if __name__ == "__main__":
    main()
