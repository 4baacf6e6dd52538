#!/bin/bash
# Benchmark matrix on the attached TPU.
#
#   sh scripts/bench.sh          # headline eval benchmark only (driver metric)
#   sh scripts/bench.sh full     # eval fp32/bf16 + train step + 5-shot + bf16 A/B
set -e
cd "$(dirname "$0")/.."

python bench.py

if [ "$1" = "full" ]; then
  echo "--- eval bf16 ---"
  BENCH_DTYPE=bfloat16 python bench.py
  echo "--- train step fp32 ---"
  BENCH_MODE=train BENCH_EPISODE_BATCH=16 python bench.py
  echo "--- eval fp32 5-shot ---"
  BENCH_SHOT=5 BENCH_EPISODE_BATCH=8 python bench.py
  echo "--- mmn-head train step fp32 ---"
  BENCH_MODE=head python bench.py
  echo "--- match-head train step fp32 ---"
  BENCH_MODE=head BENCH_HEAD=match python bench.py
  echo "--- stage-1 pretrain step fp32 ---"
  BENCH_MODE=pretrain python bench.py
  echo "--- bf16 A/B (same weights+episodes; see BENCH.md) ---"
  python -m few_shot_seg_cwt_tpu.eval.ab_dtype --episodes 128 --batch 16
fi
