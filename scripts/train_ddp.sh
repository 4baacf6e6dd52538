#!/bin/bash
# Data-parallel MMN training: identical code path, mesh over all visible chips
# (reference: scripts/train_ddp.sh -> config_files/${DATA}_ddp.yaml).
set -e
DATA=${1:-pascal}
SPLIT=${2:-0}
LAYERS=${3:-50}
SHOT=${4:-1}
CFG=configs/${DATA}_ddp.yaml
# the reference ships no coco_ddp.yaml; fall back to the mmn hyperparameters
[ -f "${CFG}" ] || CFG=configs/${DATA}_mmn.yaml
python -m few_shot_seg_cwt_tpu.train.train_ddp \
  --config ${CFG} \
  --opts train_split ${SPLIT} layers ${LAYERS} shot ${SHOT}
