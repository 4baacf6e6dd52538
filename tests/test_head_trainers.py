"""Smoke tests: every extension-head trainer runs end-to-end on synthetic data."""

import os

import jax
import numpy as np
import pytest

from few_shot_seg_cwt_tpu.config import load_cfg, merge_cfg_from_list


def _smoke_cfg(**over):
    cfg = load_cfg("configs/synthetic_smoke.yaml")
    base = {
        "image_size": 33, "adapt_iter": 3, "iter_per_epoch": 4, "epochs": 1,
        "episode_batch": 2, "test_num": 4, "debug": True, "workers": 0,
        "rmid": "l34", "temp": 20.0, "att_wt": 0.5, "trans_lr": 0.01,
    }
    base.update(over)
    opts = []
    for k, v in base.items():
        opts += [k, repr(v) if isinstance(v, str) else str(v)]
    return merge_cfg_from_list(cfg, opts)


# one representative head stays in the default tier; the full variant sweep
# is `slow` (CHM alone costs ~2 min of CPU compile)
@pytest.mark.parametrize("head,extra", [
    ("mmn", {}),
    pytest.param("mmn", {"wa": "True", "loss_shot": "'sum'", "aux": "0.5",
                         "loss_type": "'wt_dc'"}, marks=pytest.mark.slow),
    pytest.param("detr", {"sf_att": "True"}, marks=pytest.mark.slow),
    pytest.param("match", {}, marks=pytest.mark.slow),
    pytest.param("att", {}, marks=pytest.mark.slow),
    pytest.param("asy", {}, marks=pytest.mark.slow),
    pytest.param("fuse", {}, marks=pytest.mark.slow),
    pytest.param("chm", {"image_size": "41"}, marks=pytest.mark.slow),
])
def test_head_trainer_smoke(head, extra):
    from few_shot_seg_cwt_tpu.train.train_head import main

    cfg = _smoke_cfg()
    if extra:
        opts = []
        for k, v in extra.items():
            opts += [k, v]
        cfg = merge_cfg_from_list(cfg, opts)
    best = main(cfg, head_type=head)
    assert np.isfinite(best)


@pytest.mark.slow
def test_kshot_alias_uses_mmn():
    from few_shot_seg_cwt_tpu.train.train_kshot import main

    cfg = _smoke_cfg(shot=2)
    assert np.isfinite(main(cfg))


def test_train_count_runs():
    from few_shot_seg_cwt_tpu.train.train_count import main

    cfg = _smoke_cfg()
    out = main(cfg)
    assert out and all(0.0 <= v <= 1.0 for v in out.values())


def test_cca_trainer_smoke():
    from few_shot_seg_cwt_tpu.train.train_cca import main

    cfg = _smoke_cfg(num_classes_tr=17, loss_type="'wt_dc'")
    assert np.isfinite(main(cfg))


@pytest.mark.slow
def test_cca1_trainer_smoke():
    from few_shot_seg_cwt_tpu.train.train_cca1 import main

    cfg = _smoke_cfg(num_classes_tr=17, loss_type="'wt_dc'")
    assert np.isfinite(main(cfg))


@pytest.mark.slow
def test_aug_att_type_adaptive_smoke():
    """train_aug with meta_aug view selection (att_type 3 adaptive)."""
    from few_shot_seg_cwt_tpu.train.train_aug import main

    cfg = _smoke_cfg(shot=2, meta_aug=2, att_type=3)
    assert np.isfinite(main(cfg))


@pytest.mark.slow
def test_train_cwt_smoke():
    """The flagship stage-2 trainer end-to-end, exercising BOTH compiled
    steps (loss-only hot step + metrics step at log iterations)."""
    from few_shot_seg_cwt_tpu.train.train_cwt import main

    cfg = _smoke_cfg()
    miou = main(cfg)
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0


@pytest.mark.slow
def test_match_trainer_ignore_and_cyc_eval():
    """pascal_match semantics: cyc mask + ignore re-readout live at eval only
    (reference src/train_match.py:163,318-322)."""
    from few_shot_seg_cwt_tpu.train.train_head import main

    cfg = _smoke_cfg(cyc="True", ignore="True")
    miou = main(cfg, head_type="match")
    assert np.isfinite(miou)


@pytest.mark.slow
def test_train_cwt_exact_resume(tmp_path):
    """Full train-state checkpointing: 1 epoch + resume == 2 epochs straight
    (model, optimizer momentum, epoch counter and rng stream all restored —
    the reference saves {'epoch','state_dict','optimizer'}, src/train.py:146)."""
    from few_shot_seg_cwt_tpu.train.common import trans_ckpt_dir
    from few_shot_seg_cwt_tpu.train.train_cwt import main
    from few_shot_seg_cwt_tpu.utils.ckpt import load_ckpt

    def run(epochs, resume=None, tag="a"):
        cfg = _smoke_cfg(save_models=True, epochs=epochs)
        cfg.model_dir = str(tmp_path / f"ckpt_{tag}")
        cfg.debug = False
        cfg.iter_per_epoch = 6
        cfg.episode_batch = 2
        if resume:
            cfg.resume_ckpt = resume
        main(cfg)
        return trans_ckpt_dir(cfg)

    # straight 2-epoch run
    dir_a = run(2, tag="a")
    final_a = load_ckpt(os.path.join(dir_a, "final.ckpt"))

    # 1 epoch, then resume from the full train state for epoch 2
    dir_b = run(1, tag="b")
    state_path = os.path.join(dir_b, "train_state.ckpt")
    assert os.path.exists(state_path)
    dir_b2 = run(2, resume=state_path, tag="b")
    final_b = load_ckpt(os.path.join(dir_b2, "final.ckpt"))

    flat_a = jax.tree_util.tree_leaves(final_a)
    flat_b = jax.tree_util.tree_leaves(final_b)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-6, atol=1e-7)


def _assert_trees_equal(a, b, rtol=1e-6, atol=1e-7):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=rtol, atol=atol)


@pytest.mark.slow
def test_head_trainer_exact_resume(tmp_path, monkeypatch):
    """Head-trainer full-state resume: 1 epoch + resume == 2 epochs straight
    (head params, optimizer momentum, best/best1 trackers, epoch, rng)."""
    from few_shot_seg_cwt_tpu.train.train_head import main
    from few_shot_seg_cwt_tpu.utils.ckpt import load_ckpt

    base_cfg = _smoke_cfg(save_models=True, epochs=2)
    monkeypatch.chdir(tmp_path)

    def run(exp, auto=False, stop_after=None):
        # epochs stays 2 in every leg: a shorter run is a preemption
        # (stop_after_epochs), not a smaller cfg.epochs
        cfg = base_cfg.clone()
        cfg.debug = False
        cfg.exp_name = exp
        cfg.stop_after_epochs = stop_after
        cfg.auto_resume = auto
        main(cfg, head_type="mmn")
        return (f"./results/mmn_{cfg.train_name}/{cfg.arch}{cfg.layers}/"
                f"split{cfg.train_split}_shot{cfg.shot}/{exp}")

    dir_a = run("a")
    state_a = load_ckpt(os.path.abspath(os.path.join(dir_a, "train_state.ckpt")))

    dir_b = run("b", stop_after=1)  # "preempted" after epoch 1
    state_path = os.path.abspath(os.path.join(dir_b, "train_state.ckpt"))
    assert os.path.exists(state_path)
    # identical relaunch with auto_resume picks the state up by itself
    dir_b2 = run("b", auto=True)
    state_b = load_ckpt(os.path.abspath(os.path.join(dir_b2, "train_state.ckpt")))

    _assert_trees_equal(state_a, state_b)


@pytest.mark.slow
def test_cca1_trainer_exact_resume(tmp_path, monkeypatch):
    """Adaptive-CCA full-state resume, covering the per-epoch host relabel
    rng stream (resume-exact by construction)."""
    from few_shot_seg_cwt_tpu.train.train_cca1 import main
    from few_shot_seg_cwt_tpu.utils.ckpt import load_ckpt

    base_cfg = _smoke_cfg(save_models=True, epochs=2, num_classes_tr=17,
                          loss_type="'wt_dc'")
    monkeypatch.chdir(tmp_path)

    def run(exp, resume=None, stop_after=None):
        cfg = base_cfg.clone()
        cfg.debug = False
        cfg.exp_name = exp
        cfg.stop_after_epochs = stop_after
        if resume:
            cfg.resume_ckpt = resume
        main(cfg)
        return (f"./results/cca1_{cfg.train_name}/{cfg.arch}{cfg.layers}/"
                f"split{cfg.train_split}_shot{cfg.shot}/{exp}")

    dir_a = run("a")
    state_a = load_ckpt(os.path.abspath(os.path.join(dir_a, "train_state.ckpt")))

    dir_b = run("b", stop_after=1)
    state_path = os.path.abspath(os.path.join(dir_b, "train_state.ckpt"))
    assert os.path.exists(state_path)
    dir_b2 = run("b", resume=state_path)
    state_b = load_ckpt(os.path.abspath(os.path.join(dir_b2, "train_state.ckpt")))

    _assert_trees_equal(state_a, state_b)




@pytest.mark.slow
def test_mmn_trainer_use_amp_smoke():
    """use_amp (bf16 head compute) through the MMN volume path: the f32
    correlation volume meets bf16 conv params — the conv helpers must
    promote like nn.Conv did (regression: lax.conv dtype mismatch)."""
    from few_shot_seg_cwt_tpu.train.train_head import main

    cfg = _smoke_cfg()
    cfg = merge_cfg_from_list(cfg, ["use_amp", "True"])
    assert np.isfinite(main(cfg, head_type="mmn"))
