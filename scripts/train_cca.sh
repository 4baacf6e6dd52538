#!/bin/bash
# Incremental multi-way CCA training.
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
python -m few_shot_seg_cwt_tpu.train.train_cca \
  --config configs/${DATA}_cca.yaml --opts train_split ${SPLIT}
