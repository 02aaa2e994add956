#!/usr/bin/env bash
# The reference render.sh calls a missing viz_edo.py (SURVEY.md §2.5, "dead
# reference"); this wrapper drives the working equivalent instead.
python render.py --cfg configs/render_mld.yaml --npy "${1:?usage: render.sh <motion.npy> [out_dir]}" --out "${2:-renders}"
