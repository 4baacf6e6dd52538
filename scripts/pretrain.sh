#!/bin/bash
# Stage-1 base pretraining. usage: sh scripts/pretrain.sh {pascal|coco} {split} {layers}
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
LAYERS=${3:-50}
python -m few_shot_seg_cwt_tpu.train.pretrain \
  --config configs/${DATA}_pretrain.yaml \
  --opts train_split ${SPLIT} layers ${LAYERS}
