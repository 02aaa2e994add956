#!/usr/bin/env python
"""Raw HumanML3D/KIT joints -> RIC feature generation CLI.

The reference runs this as the `__main__` block of
`mld/data/humanml/scripts/motion_process.py:434-520`: for every (T, J, 3)
npy in --joints_dir, retarget to the canonical skeleton of --example, write
the 263-d (humanml3d) / 251-d (kit) feature vectors to --out_vecs
(`new_joint_vecs/`) and the recovered canonical joints to --out_joints
(`new_joints/`). Also writes Mean.npy/Std.npy over the produced features
when --stats is set (the role of the dataset's mean/std assets).

Usage:
  python tools/preprocess_humanml.py --dataset humanml3d \
      --joints_dir pose_data/joints --example 000021.npy \
      --out_vecs new_joint_vecs --out_joints new_joints --stats .
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="humanml3d", choices=["humanml3d", "kit"])
    ap.add_argument("--joints_dir", required=True)
    ap.add_argument("--example", default=None,
                    help="npy defining the canonical skeleton (reference "
                         "uses 000021.npy for t2m, 03950_gt.npy for kit); "
                         "defaults to the first file in --joints_dir")
    ap.add_argument("--out_vecs", required=True)
    ap.add_argument("--out_joints", default=None)
    ap.add_argument("--stats", default=None,
                    help="directory to write Mean.npy / Std.npy over all "
                         "produced feature frames")
    ap.add_argument("--feet_thre", type=float, default=None)
    args = ap.parse_args()

    import jax

    try:  # offline host tool: never initialize the (possibly dead) TPU relay
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp

    from seeme_tpu.core.motion_process import SPECS, get_offsets_joints, process_file
    from seeme_tpu.core.ric import recover_from_ric

    spec = SPECS[args.dataset]
    files = sorted(glob(os.path.join(args.joints_dir, "*.npy")))
    if not files:
        ap.error(f"no npy files in {args.joints_dir}")

    example = args.example or files[0]
    if not os.path.isabs(example) and not os.path.exists(example):
        example = os.path.join(args.joints_dir, example)
    ex = np.load(example).reshape(-1, spec.joints_num, 3)
    tgt_offsets = get_offsets_joints(ex[0], spec)

    os.makedirs(args.out_vecs, exist_ok=True)
    if args.out_joints:
        os.makedirs(args.out_joints, exist_ok=True)

    all_feats = []
    n_frames = 0
    for f in files:
        raw = np.load(f)
        raw = raw.reshape(len(raw), -1, 3)[:, : spec.joints_num]
        if len(raw) < 3:
            print(f"skip {f}: too short ({len(raw)} frames)")
            continue
        try:
            data, _, _, _ = process_file(
                raw, spec, tgt_offsets=tgt_offsets, feet_thre=args.feet_thre)
        except Exception as e:  # the reference also skips bad clips (:473-475)
            print(f"skip {f}: {e}")
            continue
        if not np.isfinite(data).all():
            print(f"skip {f}: non-finite features")
            continue
        name = os.path.basename(f)
        np.save(os.path.join(args.out_vecs, name), data.astype(np.float32))
        if args.out_joints:
            rec = np.asarray(recover_from_ric(
                jnp.asarray(data, jnp.float32), spec.joints_num))
            np.save(os.path.join(args.out_joints, name), rec)
        all_feats.append(data)
        n_frames += len(data)

    print(f"processed {len(all_feats)}/{len(files)} clips, {n_frames} frames "
          f"({n_frames / 20 / 60:.2f} min at 20 fps)")

    if args.stats and all_feats:
        cat = np.concatenate(all_feats, axis=0)
        np.save(os.path.join(args.stats, "Mean.npy"), cat.mean(0).astype(np.float32))
        np.save(os.path.join(args.stats, "Std.npy"), cat.std(0).astype(np.float32))
        print(f"wrote Mean.npy / Std.npy to {args.stats}")


if __name__ == "__main__":
    main()
