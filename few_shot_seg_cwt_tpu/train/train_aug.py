"""Alias trainer: reference aug entry point -> generic head trainer.

MMN with meta-augmented support streams (reference: src/train_aug.py);
enable with --opts meta_aug 2 aug_type 0.
CLI parity: `python -m few_shot_seg_cwt_tpu.train.train_aug --config ... --opts ...`.
"""

from ..config import parse_args
from .train_head import main as head_main


def main(cfg):
    return head_main(cfg, head_type="mmn")


if __name__ == "__main__":
    main(parse_args("aug trainer (TPU)"))
