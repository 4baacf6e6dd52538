#!/bin/bash
# Stage-2 CWT meta-training (reference scripts/train.sh CLI).
# usage: sh scripts/train.sh {pascal|coco} {split} {layers:50|101} {shot}
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
LAYERS=${3:-50}
SHOT=${4:-1}
python -m few_shot_seg_cwt_tpu.train.train_cwt \
  --config configs/${DATA}.yaml \
  --opts train_split ${SPLIT} layers ${LAYERS} shot ${SHOT}
