#!/bin/bash
# MMN with meta-augmented support views.
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
python -m few_shot_seg_cwt_tpu.train.train_aug \
  --config configs/${DATA}_mmn.yaml \
  --opts train_split ${SPLIT} meta_aug 2 aug_type 0
