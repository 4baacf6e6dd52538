"""AOT serving export: serialize -> deserialize -> bit-equal predictions."""

import numpy as np
import pytest

from few_shot_seg_cwt_tpu.config import load_cfg, merge_cfg_from_list


def _cfg(**over):
    cfg = load_cfg("configs/synthetic_smoke.yaml")
    base = {"image_size": 33, "adapt_iter": 4, "workers": 0, "episode_batch": 2}
    base.update(over)
    opts = []
    for k, v in base.items():
        opts += [k, repr(v) if isinstance(v, str) else str(v)]
    return merge_cfg_from_list(cfg, opts)


def _episode_batch(cfg, e=2, seed=0):
    rng = np.random.default_rng(seed)
    size, shot = cfg.image_size, cfg.shot
    return {
        "s_img": rng.normal(size=(e, shot, size, size, 3)).astype(np.float32),
        "s_label": rng.integers(0, 2, size=(e, shot, size, size)).astype(np.int32),
        "q_img": rng.normal(size=(e, size, size, 3)).astype(np.float32),
    }


def test_export_serve_roundtrip(tmp_path):
    """The serialized artifact reproduces the live engine's masks exactly."""
    import jax
    import jax.export

    from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
    from few_shot_seg_cwt_tpu.tools.export_serve import build_serve_export
    from few_shot_seg_cwt_tpu.train.common import init_backbone, init_cwt

    cfg = _cfg()
    engine = EpisodicEngine(cfg)
    vars_b = init_backbone(cfg, engine)
    vars_t = init_cwt(cfg, engine)

    e = 2
    exported = build_serve_export(cfg, vars_b, vars_t, batch=e)
    blob = exported.serialize()
    path = tmp_path / "serve.jaxexport"
    path.write_bytes(blob)

    batch = _episode_batch(cfg, e=e)
    rngs = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(e)])

    live = np.asarray(engine.serve_batch(vars_b, vars_t, batch, rngs))
    restored = jax.export.deserialize(path.read_bytes())
    served = np.asarray(restored.call(batch, rngs))

    assert served.shape == (e, cfg.image_size, cfg.image_size)
    assert served.dtype == np.int32
    assert set(np.unique(served)) <= {0, 1}
    np.testing.assert_array_equal(served, live)


def test_export_serve_sharded(tmp_path):
    """A --mesh export runs data-parallel over the virtual 8-device mesh and
    matches the single-device program episode for episode."""
    import jax
    import jax.export

    from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
    from few_shot_seg_cwt_tpu.parallel.mesh import make_mesh, shard_batch
    from few_shot_seg_cwt_tpu.tools.export_serve import build_serve_export
    from few_shot_seg_cwt_tpu.train.common import init_backbone, init_cwt

    cfg = _cfg()
    engine = EpisodicEngine(cfg)
    vars_b = init_backbone(cfg, engine)
    vars_t = init_cwt(cfg, engine)

    e, n_dev = 8, 4
    mesh = make_mesh([n_dev])
    exported = build_serve_export(cfg, vars_b, vars_t, batch=e, mesh=mesh)
    assert exported.nr_devices == n_dev

    restored = jax.export.deserialize(exported.serialize())
    batch = _episode_batch(cfg, e=e)
    rngs = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(e)])
    sharded = shard_batch({**batch, "rngs": rngs}, mesh)
    served = np.asarray(
        restored.call({k: sharded[k] for k in batch}, sharded["rngs"])
    )

    live = np.asarray(engine.serve_batch(vars_b, vars_t, batch, rngs))
    np.testing.assert_array_equal(served, live)

    with pytest.raises(ValueError, match="divisible"):
        build_serve_export(cfg, vars_b, vars_t, batch=6, mesh=mesh)


def test_serve_episode_multiclass():
    """num_classes>2 serving takes the generic argmax branch (CCA-style
    multi-way classifier, reference src/model/pspnet.py:207-221)."""
    import jax

    from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
    from few_shot_seg_cwt_tpu.train.common import init_backbone, init_cwt

    cfg = _cfg(num_classes_tr=4)
    engine = EpisodicEngine(cfg)
    assert engine.num_classes == 4
    vars_b = init_backbone(cfg, engine)
    vars_t = init_cwt(cfg, engine)
    batch = _episode_batch(cfg, e=2)
    rngs = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(2)])
    masks = np.asarray(engine.serve_batch(vars_b, vars_t, batch, rngs))
    assert masks.shape == (2, cfg.image_size, cfg.image_size)
    assert set(np.unique(masks)) <= set(range(4))


def test_export_serve_cli(tmp_path):
    """The CLI writes a loadable artifact and reports its metadata."""
    import jax.export

    from few_shot_seg_cwt_tpu.tools.export_serve import main

    out = tmp_path / "cli.jaxexport"
    info = main([
        "--config", "configs/synthetic_smoke.yaml",
        "--out", str(out), "--batch", "2",
        "--opts", "image_size", "33", "adapt_iter", "2", "workers", "0",
    ])
    assert info["bytes"] == out.stat().st_size > 0
    restored = jax.export.deserialize(out.read_bytes())
    assert restored.in_avals  # parses back into an Exported


def test_export_head_serve_roundtrip(tmp_path):
    """The MMN-head artifact reproduces the live HeadEngine prediction."""
    import jax
    import jax.export

    from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
    from few_shot_seg_cwt_tpu.tools.export_serve import build_head_serve_export
    from few_shot_seg_cwt_tpu.train.common import init_backbone
    from few_shot_seg_cwt_tpu.train.train_head import init_head_trainables

    cfg = _cfg(rmid="l34", temp=20.0, att_wt=0.2)
    engine = HeadEngine(cfg, "mmn")
    vars_b = init_backbone(cfg, engine)
    trainables = init_head_trainables(cfg, engine, vars_b)

    e = 2
    batch = _episode_batch(cfg, e=e)
    rngs = jax.vmap(jax.random.PRNGKey)(np.arange(e))

    live = jax.vmap(engine.serve_episode, in_axes=(None, None, 0, 0, None))(
        vars_b, trainables, batch, rngs, None)

    exported = build_head_serve_export(cfg, "mmn", vars_b, trainables, None, e)
    restored = jax.export.deserialize(exported.serialize())
    served = restored.call(batch, rngs)

    assert served.shape == (e, cfg.image_size, cfg.image_size)
    np.testing.assert_array_equal(np.asarray(served), np.asarray(live))
    # the blended head prediction differs from a raw-classifier mask, so the
    # artifact demonstrably carries the head (not just the inner loop)
    assert np.asarray(served).min() >= 0 and np.asarray(served).max() <= 1


@pytest.mark.slow
@pytest.mark.parametrize("head,extra", [
    ("mmn", {}),
    ("match", {}),
    ("chm", {"image_size": 41}),
    ("detr", {}),
    ("fuse", {}),
])
def test_export_head_serve_all_servable(head, extra, tmp_path):
    """Every SERVABLE head: (a) the deterministic prediction is provably
    label-free (identical under two different q_labels — the structural
    guarantee serve_episode's zeros-label DCE argument rests on), and
    (b) the exported artifact reproduces the live engine bit-for-bit.
    A future _loss_* edit that leaks label-derived values into preds['pred']
    fails (a) instead of silently serving against an all-zeros label."""
    import jax
    import jax.export

    from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
    from few_shot_seg_cwt_tpu.tools.export_serve import build_head_serve_export
    from few_shot_seg_cwt_tpu.train.common import init_backbone
    from few_shot_seg_cwt_tpu.train.train_head import (init_frozen_match,
                                                       init_head_trainables)

    cfg = _cfg(rmid="l34", temp=20.0, att_wt=0.2, **extra)
    engine = HeadEngine(cfg, head)
    vars_b = init_backbone(cfg, engine)
    trainables = init_head_trainables(cfg, engine, vars_b)
    frozen = init_frozen_match(cfg, engine) if head == "fuse" else None

    batch = _episode_batch(cfg, e=1)
    ep = {k: v[0] for k, v in batch.items()}
    rng = jax.random.PRNGKey(3)

    # (a) label independence of the deterministic prediction
    @jax.jit
    def pred_with_label(q_label):
        e = dict(ep)
        e["q_label"] = q_label
        parts = engine.episode_parts(vars_b, e, rng)
        if head == "fuse":
            _, preds = engine._loss_fuse({"params": trainables}, parts, e,
                                         rng, frozen, det=True)
        else:
            _, preds = getattr(engine, f"_loss_{head}")(
                {"params": trainables}, parts, e, rng, det=True)
        return preds["pred"]

    size = cfg.image_size
    zeros = np.zeros((size, size), np.int32)
    noisy = np.random.default_rng(7).integers(0, 2, (size, size)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(pred_with_label(zeros)),
                                  np.asarray(pred_with_label(noisy)))

    # (b) export -> restore -> bit-equal with the live engine
    rngs = jax.vmap(jax.random.PRNGKey)(np.arange(1))
    live = jax.vmap(engine.serve_episode, in_axes=(None, None, 0, 0, None))(
        vars_b, trainables, batch, rngs, frozen)
    exported = build_head_serve_export(cfg, head, vars_b, trainables, frozen, 1)
    restored = jax.export.deserialize(exported.serialize())
    served = restored.call(batch, rngs)
    np.testing.assert_array_equal(np.asarray(served), np.asarray(live))


def test_head_serve_rejects_label_dependent_heads():
    import pytest as _pytest

    from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
    from few_shot_seg_cwt_tpu.train.common import init_backbone
    from few_shot_seg_cwt_tpu.train.train_head import init_head_trainables

    cfg = _cfg(rmid="l4", temp=20.0, att_wt=0.2)
    engine = HeadEngine(cfg, "att")
    vars_b = init_backbone(cfg, engine)
    trainables = init_head_trainables(cfg, engine, vars_b)
    batch = _episode_batch(cfg, e=1)
    ep = {k: v[0] for k, v in batch.items()}
    with _pytest.raises(ValueError, match="no label-free serving"):
        engine.serve_episode(vars_b, trainables, ep, None)


@pytest.mark.slow
def test_export_head_serve_cli(tmp_path):
    from few_shot_seg_cwt_tpu.tools.export_serve import main

    out = str(tmp_path / "mmn_serve.jaxexport")
    info = main([
        "--config", "configs/synthetic_smoke.yaml",
        "--out", out, "--batch", "2", "--head", "mmn",
        "--opts", "image_size", "33", "adapt_iter", "2", "workers", "0",
        "rmid", "'l34'", "temp", "20.0", "att_wt", "0.2",
    ])
    assert info["head"] == "mmn"
    import os

    assert os.path.getsize(out) == info["bytes"]


def test_export_head_ckpt_roundtrip(tmp_path):
    """--head-ckpt must restore what train_head actually saves (the bare
    trainables tree) and bake it into the artifact."""
    import jax
    import jax.export
    import numpy as np

    from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
    from few_shot_seg_cwt_tpu.tools.export_serve import (_load_head_weights,
                                                         build_head_serve_export)
    from few_shot_seg_cwt_tpu.train.common import init_backbone
    from few_shot_seg_cwt_tpu.train.train_head import init_head_trainables
    from few_shot_seg_cwt_tpu.utils.ckpt import save_ckpt

    cfg = _cfg(rmid="l34", temp=20.0, att_wt=0.2)
    engine = HeadEngine(cfg, "mmn")
    vars_b = init_backbone(cfg, engine)
    trainables = init_head_trainables(cfg, engine, vars_b)
    # perturb so the ckpt weights are distinguishable from a fresh init
    trained = jax.tree.map(lambda t: t + 0.05, trainables)
    ck = str(tmp_path / "best.ckpt")
    save_ckpt(ck, jax.tree.map(np.asarray, trained))  # train_head's format

    _, restored, _ = _load_head_weights(cfg, "mmn", ck)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(trained)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
