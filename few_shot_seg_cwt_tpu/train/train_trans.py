"""Alias trainer: reference trans entry point -> generic head trainer.

DeTr cross/self-attention head (reference: src/train_trans.py).
CLI parity: `python -m few_shot_seg_cwt_tpu.train.train_trans --config ... --opts ...`.
"""

from ..config import parse_args
from .train_head import main as head_main


def main(cfg):
    return head_main(cfg, head_type="detr")


if __name__ == "__main__":
    main(parse_args("trans trainer (TPU)"))
