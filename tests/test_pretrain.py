"""Stage-1 pretrainer smoke + regression tests for round-2 review fixes."""

import numpy as np
import pytest

from few_shot_seg_cwt_tpu.config import load_cfg, merge_cfg_from_list


def _cfg(**over):
    cfg = load_cfg("configs/synthetic_smoke.yaml")
    base = {
        "image_size": 33, "batch_size": 4, "epochs": 1, "num_classes_tr": 4,
        "workers": 0, "debug": True, "lr": 0.01, "adapt_iter": 2,
        "episode_batch": 2, "test_num": 2, "n_runs": 1,
    }
    base.update(over)
    opts = []
    for k, v in base.items():
        opts += [k, repr(v) if isinstance(v, str) else str(v)]
    return merge_cfg_from_list(cfg, opts)


@pytest.mark.slow  # ~1 min of pretrain-program compile on 1 CPU
def test_pretrain_standard_validation():
    from few_shot_seg_cwt_tpu.train.pretrain import main

    miou = main(_cfg(smoothing=True, mixup=True, episodic_val=False))
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0


@pytest.mark.slow
def test_pretrain_episodic_validation():
    from few_shot_seg_cwt_tpu.train.pretrain import main

    miou = main(_cfg(episodic_val=True))
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0


def test_bool_opts_strings():
    """--opts flag false must disable, not store a truthy string."""
    cfg = _cfg()
    got = merge_cfg_from_list(cfg, ["mixup", "false", "smoothing", "True"])
    assert got.mixup is False
    assert got.smoothing is True
    got = merge_cfg_from_list(cfg, ["debug", "no"])
    assert got.debug is False
    with pytest.raises(ValueError, match="non-boolean string"):
        merge_cfg_from_list(cfg, ["mixup", "maybe"])


def test_randscale_fixed_size_clamps():
    """Scaled long side beyond the canvas is cropped, not a crash."""
    from few_shot_seg_cwt_tpu.data.transforms import RandScale

    t = RandScale((1.4, 1.5), fixed_size=64, padding=[1.0, 2.0, 3.0])
    img = np.random.default_rng(0).standard_normal((60, 50, 3)).astype(np.float32)
    lab = np.zeros((60, 50), np.int32)
    out_i, out_l = t(img, lab)
    assert out_i.shape == (64, 64, 3) and out_l.shape == (64, 64)


def test_scan_cache_keyed_by_data_root(tmp_path):
    from few_shot_seg_cwt_tpu.data.listing import _cache_key

    lst = tmp_path / "list.txt"
    lst.write_text("a.jpg a.png\n")
    k1 = _cache_key("/root/A", str(lst), [1, 2])
    k2 = _cache_key("/root/B", str(lst), [1, 2])
    assert k1 != k2
