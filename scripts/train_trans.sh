#!/bin/bash
# DeTr head meta-training. usage: sh scripts/train_trans.sh {pascal|coco} {split} {layers} {shot}
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
LAYERS=${3:-50}
SHOT=${4:-1}
CFG=configs/${DATA}_trans.yaml
# the reference ships no coco_trans.yaml; fall back to the base config
[ -f "${CFG}" ] || CFG=configs/${DATA}.yaml
python -m few_shot_seg_cwt_tpu.train.train_trans \
  --config ${CFG} \
  --opts train_split ${SPLIT} layers ${LAYERS} shot ${SHOT}
