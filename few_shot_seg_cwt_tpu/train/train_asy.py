"""Alias trainer: reference asy entry point -> generic head trainer.

Trains only the transductive gamma scalar (reference: src/train_asy.py).
CLI parity: `python -m few_shot_seg_cwt_tpu.train.train_asy --config ... --opts ...`.
"""

from ..config import parse_args
from .train_head import main as head_main


def main(cfg):
    return head_main(cfg, head_type="asy")


if __name__ == "__main__":
    main(parse_args("asy trainer (TPU)"))
