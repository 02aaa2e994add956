#!/bin/bash
# SMPL body models require accepting the license at https://smpl.is.tue.mpg.de
# then downloading manually. Expected layout:
#   deps/smpl_models/smpl/SMPL_NEUTRAL.pkl
#   deps/smpl_models/smpl/SMPL_MALE.pkl
#   deps/smpl_models/smpl/SMPL_FEMALE.pkl
mkdir -p deps/smpl_models/smpl
echo "Place the SMPL .pkl files under deps/smpl_models/smpl/ (license-gated download)."
