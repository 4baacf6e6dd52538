"""Stage-1 pretrainer smoke + regression tests for round-2 review fixes."""

import os

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


def test_maybe_auto_resume(tmp_path):
    """auto_resume only fires when the run's own train_state.ckpt exists and
    no explicit resume_ckpt was given."""
    from few_shot_seg_cwt_tpu.train.common import maybe_auto_resume

    cfg = _cfg()
    cfg.auto_resume = True
    maybe_auto_resume(cfg, str(tmp_path))  # nothing saved yet
    assert not cfg.resume_ckpt

    (tmp_path / "train_state.ckpt").mkdir()  # orbax ckpts are directories
    maybe_auto_resume(cfg, str(tmp_path))
    assert cfg.resume_ckpt == str(tmp_path / "train_state.ckpt")

    cfg2 = _cfg()  # default auto_resume False: never fires
    maybe_auto_resume(cfg2, str(tmp_path))
    assert not cfg2.resume_ckpt

    cfg3 = _cfg()  # explicit resume_ckpt wins
    cfg3.auto_resume = True
    cfg3.resume_ckpt = "/explicit/path.ckpt"
    maybe_auto_resume(cfg3, str(tmp_path))
    assert cfg3.resume_ckpt == "/explicit/path.ckpt"


@pytest.mark.slow
def test_pretrain_exact_resume(tmp_path, monkeypatch):
    """Stage-1 full-state resume: 1 epoch + resume == 2 epochs straight
    (params, BN stats, optimizer/cosine position, epoch, rng)."""
    import jax

    from few_shot_seg_cwt_tpu.train.pretrain import main
    from few_shot_seg_cwt_tpu.utils.ckpt import load_ckpt

    base_cfg = _cfg(debug=False)  # debug mode forces save_models off
    monkeypatch.chdir(tmp_path)

    def run(resume=None, exp="a", stop_after=None):
        # epochs stays 2 in EVERY leg: the cosine schedule length depends on
        # cfg.epochs, so a "shorter run" is a preemption (stop_after_epochs),
        # not a smaller epochs value
        cfg = base_cfg.clone()
        cfg.epochs = 2
        cfg.save_models = True
        cfg.exp_name = exp
        cfg.stop_after_epochs = stop_after
        if resume:
            cfg.resume_ckpt = resume
        main(cfg)
        return (f"./results/pretrain_{cfg.train_name}/{cfg.arch}{cfg.layers}/"
                f"split{cfg.train_split}_shot{cfg.shot}/{exp}")

    dir_a = run(exp="a")
    final_a = load_ckpt(os.path.abspath(os.path.join(dir_a, "final.ckpt")))

    dir_b = run(exp="b", stop_after=1)  # "preempted" after epoch 0
    state = os.path.abspath(os.path.join(dir_b, "train_state.ckpt"))
    assert os.path.exists(state)
    dir_b2 = run(resume=state, exp="b")
    final_b = load_ckpt(os.path.abspath(os.path.join(dir_b2, "final.ckpt")))

    for xa, xb in zip(jax.tree_util.tree_leaves(final_a),
                      jax.tree_util.tree_leaves(final_b)):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-6, atol=1e-7)
