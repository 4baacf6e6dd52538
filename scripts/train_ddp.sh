#!/bin/bash
# Data-parallel MMN training: identical code path, mesh over all visible chips.
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
LAYERS=${3:-50}
SHOT=${4:-1}
python -m few_shot_seg_cwt_tpu.train.train_ddp \
  --config configs/${DATA}_mmn.yaml \
  --opts train_split ${SPLIT} layers ${LAYERS} shot ${SHOT}
