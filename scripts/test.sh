#!/bin/bash
# Episodic evaluation (reference scripts/test.sh CLI).
# usage: sh scripts/test.sh {pascal|coco} {shot} {layers:50|101} {split}
set -e
DATA=${1:-pascal}
SHOT=${2:-1}
LAYERS=${3:-50}
SPLIT=${4:-0}
python -m few_shot_seg_cwt_tpu.train.test \
  --config configs/${DATA}.yaml \
  --opts train_split ${SPLIT} layers ${LAYERS} shot ${SHOT} \
         cls_lr 0.1 test_num 1000 n_runs 5
