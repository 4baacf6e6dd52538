"""Adaptive incremental CCA trainer (reference: src/train_cca1.py).

Like train_cca but the support relabeling grows the per-episode class count
from the base classifier's pseudo labels (adapt_reset_spt_label) in a
host-side pass before each device step.
"""

from ..config import parse_args
from .train_cca import main as cca_main


def main(cfg):
    return cca_main(cfg, adaptive=True)


if __name__ == "__main__":
    main(parse_args("adaptive incremental CCA trainer (TPU)"))
