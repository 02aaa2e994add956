#!/usr/bin/env python
"""Rendering CLI: npy joint sequences -> videos.

Same npy contract as the reference `render.py:47-...` (`--npy` one file or
`--dir` a folder of `(T, J, 3)` arrays). Uses the matplotlib backend; the
Blender mesh backend activates only when `bpy` is importable, as in the
reference (`mld/render/blender/`)."""

from __future__ import annotations

import argparse
import os
from glob import glob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npy", default=None, help="single (T, J, 3) npy file")
    ap.add_argument("--dir", default=None, help="folder of npy files")
    ap.add_argument("--out", default="renders")
    ap.add_argument("--fps", type=int, default=20)
    ap.add_argument("--ext", default="gif", choices=["gif", "mp4"])
    args = ap.parse_args()

    import numpy as np

    from seeme_tpu.render.joints import blender_available, render_joints_video

    files = []
    if args.npy:
        files.append(args.npy)
    if args.dir:
        files.extend(sorted(glob(os.path.join(args.dir, "*.npy"))))
    if not files:
        ap.error("provide --npy or --dir")

    if blender_available():
        print("bpy detected — mesh rendering available (not used for joints)")

    os.makedirs(args.out, exist_ok=True)
    for f in files:
        data = np.load(f, allow_pickle=True)
        if data.ndim == 2:  # (T, J*3)
            data = data.reshape(data.shape[0], -1, 3)
        name = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(args.out, f"{name}.{args.ext}")
        written = render_joints_video(data, out, fps=args.fps, title=name)
        print(f"rendered {f} -> {written}")


if __name__ == "__main__":
    main()
