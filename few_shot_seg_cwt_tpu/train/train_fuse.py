"""Alias trainer: reference fuse entry point -> generic head trainer.

FuseNet1 fusion weights over a frozen MatchNet (reference: src/train_fuse.py).
CLI parity: `python -m few_shot_seg_cwt_tpu.train.train_fuse --config ... --opts ...`.
"""

from ..config import parse_args
from .train_head import main as head_main


def main(cfg):
    return head_main(cfg, head_type="fuse")


if __name__ == "__main__":
    main(parse_args("fuse trainer (TPU)"))
