"""Episode-stream record/replay: reference sampler -> JAX eval parity plumbing.

The recorder walks the REFERENCE torch sampler with its exact seeding and the
replay dataset feeds the identical episode composition through the JAX eval
(VERDICT r2 item 1) — so a future real-assets ±0.3 mIoU comparison measures
framework delta, not sampling noise.
"""

import json
import os

import cv2
import numpy as np
import pytest

from few_shot_seg_cwt_tpu.config import default_cfg

from tests import ref_compat

pytestmark = pytest.mark.skipif(
    not ref_compat.HAVE_REF, reason="reference tree not present")

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "sample_episode_log.jsonl")


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    """A tiny on-disk dataset both frameworks can read: 8 images, classes 1/2."""
    root = tmp_path_factory.mktemp("voc_replay")
    (root / "img").mkdir()
    (root / "lab").mkdir()
    rng = np.random.default_rng(7)
    lines = []
    for i in range(8):
        img = rng.integers(0, 255, size=(90, 110, 3)).astype(np.uint8)
        lab = np.zeros((90, 110), np.uint8)
        cls = 1 if i < 4 else 2
        lab[5:75, 5:75] = cls  # 4900 px >= 2*32*32
        cv2.imwrite(str(root / "img" / f"{i}.jpg"), img)
        cv2.imwrite(str(root / "lab" / f"{i}.png"), lab)
        lines.append(f"img/{i}.jpg lab/{i}.png\n")
    lst = root / "val.txt"
    lst.write_text("".join(lines))
    return root, lst


def _cfg(root, lst, **kw):
    cfg = default_cfg()
    cfg.data_root = str(root)
    cfg.train_list = str(lst)
    cfg.val_list = str(lst)
    cfg.image_size = 65
    cfg.workers = 0
    cfg.scan_cache = None
    # classes 1 and 2 must be VAL classes: fold 0 vals are classes 1..5
    cfg.train_split = 0
    cfg.manual_seed = 2021
    cfg.shot = 1
    for k, v in kw.items():
        cfg[k] = v
    return cfg


def test_recorder_is_deterministic_and_reference_seeded(voc_tree):
    from few_shot_seg_cwt_tpu.tools.record_episodes import record

    root, lst = voc_tree
    cfg = _cfg(root, lst)
    eps1 = record(cfg, ref_compat.REF, n_episodes=12)
    eps2 = record(cfg, ref_compat.REF, n_episodes=12)
    assert eps1 == eps2, "same seed must produce the identical stream"
    assert len(eps1) == 12
    # queries walk the val list in order with wrap-around (shuffle=False)
    assert [e["q"][0] for e in eps1[:8]] == [f"img/{i}.jpg" for i in range(8)]
    assert eps1[8]["q"][0] == "img/0.jpg"
    for e in eps1:
        assert e["cls"] in (1, 2)
        assert len(e["s"]) == 1
        assert e["s"][0][0] != e["q"][0], "support must exclude the query"

    # a different seed must change the support composition
    eps3 = record(_cfg(root, lst, manual_seed=7), ref_compat.REF, n_episodes=12)
    assert eps3 != eps1


def test_replay_matches_reference_tensors(voc_tree, tmp_path):
    """The replayed q/s tensors equal the reference's transformed tensors."""
    from few_shot_seg_cwt_tpu.data.replay import ReplayEpisodicDataset
    from few_shot_seg_cwt_tpu.tools.record_episodes import (
        _install_reference, record)

    root, lst = voc_tree
    cfg = _cfg(root, lst)
    episodes = record(cfg, ref_compat.REF, n_episodes=6)
    log = tmp_path / "episodes.jsonl"
    log.write_text("".join(json.dumps(e) + "\n" for e in episodes))

    ds = ReplayEpisodicDataset(cfg, str(log))
    assert len(ds) == 6

    # reference tensors for the SAME stream (recorder re-walks, same seed)
    _install_reference(ref_compat.REF)
    import random

    import torch

    from src.dataset import transform as ref_transform
    from src.dataset.dataset import EpisodicData

    random.seed(cfg.manual_seed)
    np.random.seed(cfg.manual_seed)
    torch.manual_seed(cfg.manual_seed)
    val_transform = ref_transform.Compose([
        ref_transform.Resize(cfg.image_size, padding=None),
        ref_transform.ToTensor(),
        ref_transform.Normalize(mean=cfg.mean, std=cfg.std),
    ])
    ref_ds = EpisodicData(mode_train=False, dt_transform=val_transform,
                          class_list=[1, 2, 3, 4, 5], args=cfg)

    for e in range(6):
        ref_q, ref_qlab, ref_s, ref_slab, subcls, _, _ = ref_ds[e]
        got = ds[e]
        np.testing.assert_allclose(
            got["q_img"], ref_q.numpy().transpose(1, 2, 0),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got["q_label"], ref_qlab.numpy())
        np.testing.assert_allclose(
            got["s_img"], ref_s.numpy().transpose(0, 2, 3, 1),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got["s_label"], ref_slab.numpy())
        assert int(got["cls"]) == subcls[0]


def test_replay_flag_feeds_validate(voc_tree, tmp_path):
    """--opts replay <log>: the eval consumes the log through the normal loader."""
    import jax

    from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
    from few_shot_seg_cwt_tpu.eval.validate import validate_transformer
    from few_shot_seg_cwt_tpu.tools.record_episodes import record
    from few_shot_seg_cwt_tpu.train.common import episodic_val_loader

    root, lst = voc_tree
    cfg = _cfg(root, lst, adapt_iter=3, episode_batch=4, test_num=8, n_runs=1)
    episodes = record(cfg, ref_compat.REF, n_episodes=8)
    log = tmp_path / "episodes.jsonl"
    log.write_text("".join(json.dumps(e) + "\n" for e in episodes))
    cfg.replay = str(log)

    engine = EpisodicEngine(cfg)
    import jax.numpy as jnp

    probe = jnp.zeros((1, 65, 65, 3), jnp.float32)
    vars_b = engine.backbone.init({"params": jax.random.PRNGKey(0)}, probe,
                                  train=False)
    d = cfg.bottleneck_dim
    f = jnp.zeros((1, 9, 9, d), jnp.float32)
    vars_t = engine.cwt.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, d)), f, f)

    loader = episodic_val_loader(cfg)
    from few_shot_seg_cwt_tpu.data.replay import ReplayEpisodicDataset

    assert isinstance(loader.dataset, ReplayEpisodicDataset)
    miou, loss = validate_transformer(
        cfg, engine, vars_b, vars_t, loader, log=lambda *a: None)
    assert 0.0 <= miou <= 1.0 and np.isfinite(loss)

    # run-boundary protection: a batch size that would bleed filler episodes
    # across the recorded run boundary must be rejected loudly
    bad = cfg.clone()
    bad.test_num = 6
    with pytest.raises(AssertionError, match="replay"):
        validate_transformer(bad, engine, vars_b, vars_t,
                             episodic_val_loader(bad), log=lambda *a: None)


def test_committed_fixture_format():
    """The checked-in sample log documents the format and always parses."""
    from few_shot_seg_cwt_tpu.data.replay import load_episode_log

    eps = load_episode_log(FIXTURE)
    for e in eps:
        assert set(e) == {"q", "cls", "s"}
        assert len(e["q"]) == 2 and isinstance(e["cls"], int)
        assert all(len(pair) == 2 for pair in e["s"])


def test_ab_dtype_on_replay_stream(voc_tree, tmp_path):
    """--replay: the dtype A/B consumes the recorded stream (real images)."""
    import json as _json

    from few_shot_seg_cwt_tpu.eval.ab_dtype import run_ab
    from few_shot_seg_cwt_tpu.tools.record_episodes import record

    root, lst = voc_tree
    cfg = _cfg(root, lst, adapt_iter=2)
    episodes = record(cfg, ref_compat.REF, n_episodes=4)
    log = tmp_path / "ep.jsonl"
    log.write_text("".join(_json.dumps(e) + "\n" for e in episodes))
    cfg.replay = str(log)
    cfg.resume_weights = ""

    r = run_ab(cfg, n_episodes=4, e_batch=2, log=lambda *a: None)
    assert r["episodes"] == 4
    assert np.isfinite(r["miou_fp32"]) and np.isfinite(r["miou_bf16"])
