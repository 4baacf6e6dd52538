#!/bin/bash
# FuseNet1 fusion-weight training over a frozen MatchNet
# (reference: scripts/train_fuse.sh -> config_files/${DATA}_fuse.yaml).
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
CFG=configs/${DATA}_fuse.yaml
# the reference ships no coco_fuse.yaml; fall back to the base config
[ -f "${CFG}" ] || CFG=configs/${DATA}.yaml
python -m few_shot_seg_cwt_tpu.train.train_fuse \
  --config ${CFG} --opts train_split ${SPLIT}
