"""Alias trainer: correlation-matching heads (reference: src/train_match.py).

crm_type selects MatchNet neighbourhood consensus ('nc') or the convolutional
Hough matcher ('chm').
"""

from ..config import parse_args
from .train_head import main as head_main


def main(cfg):
    head = "chm" if cfg.get("crm_type", "nc") == "chm" else "match"
    return head_main(cfg, head_type=head)


if __name__ == "__main__":
    main(parse_args("match trainer (TPU)"))
