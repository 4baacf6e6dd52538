#!/bin/bash
# MMN with meta-augmented support views (reference: scripts/train_aug.sh).
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
LAYERS=${3:-50}
SHOT=${4:-1}
python -m few_shot_seg_cwt_tpu.train.train_aug \
  --config configs/${DATA}_aug.yaml \
  --opts train_split ${SPLIT} layers ${LAYERS} shot ${SHOT}
