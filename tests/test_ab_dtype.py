"""bf16 A/B harness: runs end-to-end and reports sane numbers (tiny CPU run)."""

import numpy as np

from few_shot_seg_cwt_tpu.config import default_cfg
from few_shot_seg_cwt_tpu.eval.ab_dtype import run_ab


def test_run_ab_tiny():
    cfg = default_cfg()
    cfg.image_size = 33
    cfg.adapt_iter = 3
    cfg.pretrained = False
    out = run_ab(cfg, n_episodes=4, e_batch=2, log=lambda *a: None)
    assert out["episodes"] == 4
    for k in ("miou_fp32", "miou_bf16", "miou_raw_fp32", "miou_raw_bf16"):
        assert 0.0 <= out[k] <= 1.0, (k, out[k])
    assert 0.0 <= out["argmax_flip_rate"] <= 1.0
    assert np.isfinite(out["delta_pts"])
    # identical inputs through the two engines stay close even on CPU
    # (CPU "bf16" casts round-trip through fp32 matmuls, so the delta is
    # dominated by the cast itself)
    assert abs(out["delta_pts"]) <= 50.0
