"""Alias trainer: reference DDP entry point -> mesh-parallel head trainer.

The reference spawns one NCCL process per GPU (src/train_ddp.py:358-366);
here data parallelism is declarative — the generic trainer shards the episode
batch over the device mesh automatically whenever >1 device is visible, so
this alias exists purely for CLI parity.
"""

from ..config import parse_args
from .train_head import main as head_main


def main(cfg):
    return head_main(cfg, head_type="mmn")


if __name__ == "__main__":
    main(parse_args("ddp trainer (TPU mesh)"))
