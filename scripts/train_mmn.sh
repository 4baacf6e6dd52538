#!/bin/bash
# MMN k-shot meta-training. usage: sh scripts/train_mmn.sh {pascal|coco} {split} {layers} {shot}
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
LAYERS=${3:-50}
SHOT=${4:-1}
python -m few_shot_seg_cwt_tpu.train.train_kshot \
  --config configs/${DATA}_mmn.yaml \
  --opts train_split ${SPLIT} layers ${LAYERS} shot ${SHOT}
