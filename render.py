#!/usr/bin/env python
"""Rendering CLI: npy joint sequences -> videos.

Same npy contract as the reference `render.py:47-...` (`--npy` one file or
`--dir` a folder of `(T, J, 3)` arrays). `--pairs` renders `pred_*.npy`
against the matching `gt_*.npy` in one overlay video — the role of the
reference's `render_vae.py` over saved gt/pred dumps (test.py
SAVE_PREDICTIONS writes exactly these pairs). Uses the matplotlib backend;
the Blender mesh backend activates only when `bpy` is importable, as in the
reference (`mld/render/blender/`)."""

from __future__ import annotations

import argparse
import os
from glob import glob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None,
                    help="render config yaml (configs/render_mld.yaml "
                         "RENDER block supplies defaults; flags override)")
    ap.add_argument("--npy", default=None, help="single (T, J, 3) npy file")
    ap.add_argument("--dir", default=None, help="folder of npy files")
    ap.add_argument("--out", default="renders")
    ap.add_argument("--fps", type=int, default=None)
    ap.add_argument("--ext", default=None, choices=["gif", "mp4"])
    ap.add_argument("--pairs", action="store_true",
                    help="in --dir, overlay pred_*.npy with matching gt_*.npy")
    ap.add_argument("--mesh", action="store_true",
                    help="render SMPL mesh videos (vertex npys, e.g. "
                         "*_mesh.npy from demo.py --mesh or fit.py "
                         "--save_mesh); auto-detected for (T, V>1000, 3)")
    ap.add_argument("--faces", default=None,
                    help="(F, 3) faces npy; defaults to the configured SMPL "
                         "model's faces (synthetic strip if asset absent)")
    ap.add_argument("--mode", default=None,
                    choices=["video", "sequence", "frame"],
                    help="mesh render mode (reference blender/render.py)")
    ap.add_argument("--gt", action="store_true",
                    help="use the ground-truth (green) mesh material")
    args = ap.parse_args()

    if args.cfg:
        # the reference render.py is config-driven (`RENDER:` block,
        # configs/render_mld.yaml); flags still win when given
        from seeme_tpu.config import load_config

        r = load_config(args.cfg).get("RENDER", {})
        args.npy = args.npy or (str(r.get("NPY", "")) or None)
        args.dir = args.dir or (str(r.get("DIR", "")) or None)
        args.mode = args.mode or str(r.get("MODE", "video"))
        args.fps = args.fps if args.fps is not None else int(r.get("FPS", 20))
        args.ext = args.ext or str(r.get("VID_EXT", "gif"))
        args.faces = args.faces or (str(r.get("FACES_PATH", "")) or None)
    args.mode = args.mode or "video"
    args.fps = args.fps if args.fps is not None else 20
    args.ext = args.ext or "gif"

    import numpy as np

    from seeme_tpu.render.joints import blender_available, render_joints_video
    from seeme_tpu.render.mesh import mesh_detect, render_mesh

    files = []
    if args.npy:
        files.append(args.npy)
    if args.dir:
        pattern = "pred_*.npy" if args.pairs else "*.npy"
        files.extend(sorted(glob(os.path.join(args.dir, pattern))))
    if not files:
        ap.error("provide --npy or --dir" +
                 (" (no pred_*.npy found)" if args.pairs else ""))

    if blender_available():
        print("bpy detected — Blender mesh backend active")

    faces = None
    if args.faces:
        faces = np.load(args.faces)

    def smpl_faces():
        from seeme_tpu.core.smpl import synthetic_smpl
        m = synthetic_smpl(n_verts=6890)
        return m.faces

    os.makedirs(args.out, exist_ok=True)
    def load(path):
        data = np.load(path, allow_pickle=True)
        if data.ndim == 2:  # (T, J*3)
            data = data.reshape(data.shape[0], -1, 3)
        return data

    for f in files:
        data = load(f)
        name = os.path.splitext(os.path.basename(f))[0]
        if args.mesh or mesh_detect(data):
            fc = faces if faces is not None else smpl_faces()
            if fc.max() >= data.shape[1]:
                ap.error(f"faces index up to {fc.max()} but {f} has only "
                         f"{data.shape[1]} vertices — pass a matching --faces")
            out = os.path.join(args.out, f"{name}.{args.ext}")
            written = render_mesh(data, fc, out, mode=args.mode,
                                  fps=args.fps, gt=args.gt, title=name)
            print(f"rendered mesh {f} -> {written}")
            continue
        gt = None
        if args.pairs:
            gt_path = os.path.join(
                os.path.dirname(f), os.path.basename(f).replace("pred_", "gt_", 1)
            )
            if os.path.exists(gt_path):
                gt = load(gt_path)
        out = os.path.join(args.out, f"{name}.{args.ext}")
        written = render_joints_video(data, out, fps=args.fps, title=name,
                                      gt_joints=gt)
        print(f"rendered {f} -> {written}" + (" (+gt overlay)" if gt is not None else ""))


if __name__ == "__main__":
    main()
