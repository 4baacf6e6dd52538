#!/bin/bash
# FuseNet1 fusion-weight training over a frozen MatchNet.
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
python -m few_shot_seg_cwt_tpu.train.train_fuse \
  --config configs/${DATA}.yaml --opts train_split ${SPLIT} rmid "'l4'"
