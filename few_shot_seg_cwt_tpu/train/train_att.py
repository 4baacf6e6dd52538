"""Alias trainer: reference att entry point -> generic head trainer.

Raw attention variants selected by trans_type (reference: src/train_att.py).
CLI parity: `python -m few_shot_seg_cwt_tpu.train.train_att --config ... --opts ...`.
"""

from ..config import parse_args
from .train_head import main as head_main


def main(cfg):
    return head_main(cfg, head_type="att")


if __name__ == "__main__":
    main(parse_args("att trainer (TPU)"))
