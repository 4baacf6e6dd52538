"""Dataset statistics: per-class foreground pixel ratios over episodes.

Parity with the reference audit tool (reference: src/train_count.py:60-88):
samples episodes and accumulates, per class, the mean FG/ALL pixel ratio of
support masks — useful for sanity-checking a new data_root / list file.

CLI: python -m few_shot_seg_cwt_tpu.train.train_count --config ... \
     [--opts test_num 2000]
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..config import parse_args
from .common import apply_debug, episodic_dataset, set_seeds


def main(cfg):
    set_seeds(cfg)
    apply_debug(cfg)
    ds = episodic_dataset(cfg, train=True)
    n = min(cfg.test_num, len(ds)) if not cfg.get("synthetic_data") else cfg.test_num
    ratios = defaultdict(list)
    for i in range(n):
        ep = ds[i % len(ds)]
        lab = ep["s_label"]
        valid = lab != 255
        fg = int(((lab == 1) & valid).sum())
        total = int(valid.sum())
        if total:
            ratios[int(ep["cls"])].append(fg / total)
    print(f"class ratios over {n} episodes:")
    out = {}
    for c in sorted(ratios):
        out[c] = float(np.mean(ratios[c]))
        print(f"  class {c}: fg/all = {out[c]:.4f} (n={len(ratios[c])})")
    return out


if __name__ == "__main__":
    main(parse_args("episode statistics"))
