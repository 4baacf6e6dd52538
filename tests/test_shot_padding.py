"""Padded support shots must not leak into the k-shot heads or the sampler.

random_shot pads episodes to max_shot with all-255-label rows
(data/episodic.py); the inner loop zero-weights them, and the k-shot heads
(MMN averaging, attention over support pixels) must exclude them too —
the reference instead loops over the true shot count
(reference: src/train_kshot.py:159-180).
"""

import jax
import numpy as np
import pytest

from few_shot_seg_cwt_tpu.config import default_cfg
from few_shot_seg_cwt_tpu.data.synthetic import make_episode
from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine


def _padded_episode(seed, pad_fill, size=33, shot=1, max_shot=3):
    """Episode with `shot` real supports padded to max_shot; pad images
    filled with `pad_fill` garbage (labels all 255)."""
    rng = np.random.default_rng(seed)
    ep = make_episode(rng, size=size, shot=shot)
    pad_n = max_shot - shot
    pad_img = np.full((pad_n, size, size, 3), pad_fill, np.float32) * rng.standard_normal(
        (pad_n, size, size, 3)
    ).astype(np.float32)
    pad_lab = np.full((pad_n, size, size), 255, np.int32)
    import jax.numpy as jnp

    return {
        "s_img": jnp.asarray(np.concatenate([ep["s_img"], pad_img], 0)),
        "s_label": jnp.asarray(np.concatenate([ep["s_label"], pad_lab], 0)),
        "q_img": jnp.asarray(ep["q_img"]),
        "q_label": jnp.asarray(ep["q_label"]),
        "cls": jnp.asarray(ep["cls"]),
    }


@pytest.mark.parametrize("head", ["mmn", "att"])
def test_pad_shot_content_invariance(head):
    """Changing the CONTENT of padded shots must not change loss or preds."""
    cfg = default_cfg()
    cfg.pretrained = False
    cfg.image_size = 33
    cfg.adapt_iter = 2
    cfg.shot = 3
    cfg.rmid = "l34"
    cfg.temp = 20.0
    cfg.att_wt = 0.5
    cfg.loss_shot = "sum"

    engine = HeadEngine(cfg, head)
    import jax.numpy as jnp

    probe = {
        "s_img": jnp.zeros((3, 33, 33, 3)), "s_label": jnp.zeros((3, 33, 33), jnp.int32),
        "q_img": jnp.zeros((33, 33, 3)), "q_label": jnp.zeros((33, 33), jnp.int32),
        "cls": jnp.asarray(1),
    }
    rng = jax.random.PRNGKey(0)
    vars_b = jax.jit(
        lambda: engine.backbone.init(
            {"params": rng},
            jnp.zeros((1, 33, 33, 3)), train=False)
    )()
    parts = engine.episode_parts(vars_b, probe, rng)
    if head == "mmn":
        probe_args = (parts["fq_feats"], parts["fs_feats"],
                      parts["f_q"], parts["f_s"])
    else:
        dk = parts["fq_feats"][4][-1].shape[-1]     # stage-4 channel width
        probe_args = (jnp.zeros((1, 2, dk)), jnp.zeros((1, 2, 512)),
                      jnp.zeros((1, 2, dk)), jnp.zeros((1, 2, 512)),
                      jnp.zeros((1, 2), bool))
    head_vars = engine.head.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        *probe_args,
    )

    fn = jax.jit(lambda e: engine.train_episode_loss(
        head_vars["params"], vars_b, e, jax.random.PRNGKey(5)))

    ep_a = _padded_episode(seed=7, pad_fill=0.0)
    ep_b = _padded_episode(seed=7, pad_fill=37.5)   # garbage pads
    loss_a, m_a = jax.tree.map(np.asarray, fn(ep_a))
    loss_b, m_b = jax.tree.map(np.asarray, fn(ep_b))
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    np.testing.assert_allclose(m_a["inter1"], m_b["inter1"], rtol=1e-5)
    np.testing.assert_allclose(m_a["inter"], m_b["inter"], rtol=1e-5)
    assert np.isfinite(loss_a)


def test_support_with_aug_always_meta_aug_views():
    """Every aug_type yields exactly meta_aug rows per shot (static shapes)."""
    from few_shot_seg_cwt_tpu.data.episodic import EpisodicDataset

    class _Stub(EpisodicDataset):
        def __init__(self, aug_type, meta_aug):  # bypass file scanning
            from few_shot_seg_cwt_tpu.data import transforms as T

            self.aug_type = aug_type
            self.meta_aug = meta_aug
            self.image_size = 65
            self.padding = [0.0, 0.0, 0.0]
            self.aug_th = (0.15, 0.30)
            self.transform = T.Compose([
                T.ResizeSquare((65, 65)),
                T.ToNormalized([0.0] * 3, [1.0] * 3),
            ])
            self._resize_norm = list(self.transform.segtransform)
            self._norm_only = list(self.transform.segtransform[-1:])

    rng = np.random.default_rng(3)
    for aug_type in (0, 1, 2, 3, 10):
        for meta_aug in (2, 3):
            ds = _Stub(aug_type, meta_aug)
            for fg in (0.01, 0.2, 0.5):  # hit every fg_ratio branch
                lab = (rng.random((80, 90)) < fg).astype(np.int32)
                img = rng.standard_normal((80, 90, 3)).astype(np.float32)
                vi, vl = ds._support_with_aug(img, lab)
                assert vi.shape[0] == meta_aug, (aug_type, meta_aug, fg, vi.shape)
                assert vl.shape[0] == meta_aug
                assert vi.shape[1:] == (65, 65, 3)


def test_sampler_raises_instead_of_hanging_on_small_class():
    """Support rejection sampling fails loudly when shot > available images."""
    from few_shot_seg_cwt_tpu.data.episodic import EpisodicDataset

    ds = EpisodicDataset.__new__(EpisodicDataset)
    ds.data_list = [("img0", "lab0")]
    ds.class_files = {1: [("img0", "lab0"), ("img1", "lab1")]}
    ds.class_list = [1]
    ds.random_shot = False
    ds.shot = 3
    ds.max_shot = 3
    ds.meta_aug = 1

    import few_shot_seg_cwt_tpu.data.episodic as E

    orig = E._read_pair
    E._read_pair = lambda ip, lp: (
        np.zeros((40, 40, 3), np.float32),
        np.pad(np.ones((20, 20), np.uint8), ((0, 20), (0, 20))),
    )
    try:
        with pytest.raises(RuntimeError, match="cannot draw"):
            ds.sample(0)
    finally:
        E._read_pair = orig


def test_head_engine_use_amp_backbone_cast():
    """use_amp runs the head trainers' backbone in bf16 (reference AMP,
    src/train_kshot.py:146-190); head math stays f32 and the loss stays
    close to the fp32 engine's."""
    import jax

    cfg = default_cfg()
    cfg.image_size = 33
    cfg.adapt_iter = 2
    cfg.rmid = "l34"
    cfg.att_wt = 0.5
    e32 = HeadEngine(cfg, "mmn")
    cfg_amp = cfg.clone()
    cfg_amp.use_amp = True
    eamp = HeadEngine(cfg_amp, "mmn")
    assert eamp._cast_backbone and not e32._cast_backbone

    import jax.numpy as jnp

    probe = jnp.zeros((1, 33, 33, 3), jnp.float32)
    vars_b = e32.backbone.init({"params": jax.random.PRNGKey(0)}, probe,
                               train=False)
    rng = np.random.default_rng(5)
    ep = make_episode(rng, size=33, shot=1)
    ep = {k: jnp.asarray(v) for k, v in ep.items()}
    tr = jax.jit(lambda e: HeadEngine.episode_parts(e32, vars_b, e,
                                                    jax.random.PRNGKey(1)))
    ta = jax.jit(lambda e: HeadEngine.episode_parts(eamp, vars_b, e,
                                                    jax.random.PRNGKey(1)))
    p32 = tr(ep)
    pamp = ta(ep)
    assert pamp["f_q"].dtype == jnp.float32  # head math stays f32
    # bf16 backbone wiggles features, not wrecks them
    denom = np.abs(np.asarray(p32["f_q"])).mean() + 1e-6
    rel = np.abs(np.asarray(pamp["f_q"]) - np.asarray(p32["f_q"])).mean() / denom
    assert rel < 0.15, rel


def test_scanned_shot_readout_equals_batched():
    """_mmn_att_shots' per-shot lax.map (shot > 1) must equal a direct
    batched MMN apply in deterministic mode — the scan exists for memory,
    not semantics."""
    import jax
    import jax.numpy as jnp

    from few_shot_seg_cwt_tpu.config import default_cfg
    from few_shot_seg_cwt_tpu.data.synthetic import make_episode_batch
    from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
    from few_shot_seg_cwt_tpu.train.common import init_backbone
    from few_shot_seg_cwt_tpu.train.train_head import init_head_trainables

    cfg = default_cfg()
    cfg.image_size = 33
    cfg.adapt_iter = 2
    cfg.shot = 3
    cfg.rmid = "l34"
    cfg.att_wt = 0.2
    cfg.wa = True   # give the query branch real prep work so the
                    # shot_hoist_query path below is exercised, not a no-op
    engine = HeadEngine(cfg, "mmn")
    vars_b = init_backbone(cfg, engine)
    trainables = init_head_trainables(cfg, engine, vars_b)

    host = make_episode_batch(seed=7, e=1, size=33, shot=3)
    episode = {k: jnp.asarray(v[0]) for k, v in host.items()}
    rng = jax.random.PRNGKey(3)
    parts = engine.episode_parts(vars_b, episode, rng)

    scanned = engine._mmn_att_shots(
        {"params": trainables}, parts["fq_feats"], parts["fs_feats"],
        parts["f_q"], parts["f_s"], rng, det=True)
    _, _, batched = engine.head.apply(
        {"params": trainables}, parts["fq_feats"], parts["fs_feats"],
        parts["f_q"], parts["f_s"], ret_shots=True, deterministic=True)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(batched),
                               rtol=2e-4, atol=2e-5)

    # shot_tile chunks the scan (vmapped groups) without changing results;
    # a tile that does not divide the shot count falls back to sequential
    for tile in (3, 2):
        engine.cfg.shot_tile = tile
        tiled = engine._mmn_att_shots(
            {"params": trainables}, parts["fq_feats"], parts["fs_feats"],
            parts["f_q"], parts["f_s"], rng, det=True)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(scanned),
                                   rtol=2e-4, atol=2e-5, err_msg=f"tile={tile}")
    engine.cfg.shot_tile = 1

    # shot_native routes _mmn_att_shots straight through the batched apply
    # (shots on the consensus route's conv batch axis, no per-shot map/remat)
    engine.cfg.shot_native = True
    native = engine._mmn_att_shots(
        {"params": trainables}, parts["fq_feats"], parts["fs_feats"],
        parts["f_q"], parts["f_s"], rng, det=True)
    np.testing.assert_allclose(np.asarray(native), np.asarray(batched),
                               rtol=1e-6, atol=1e-7)
    engine.cfg.shot_native = False

    # shot_remat=False drops the per-shot checkpoint (memory-for-recompute
    # dial); the forward values are identical ops, so exactly equal
    engine.cfg.shot_remat = False
    noremat = engine._mmn_att_shots(
        {"params": trainables}, parts["fq_feats"], parts["fs_feats"],
        parts["f_q"], parts["f_s"], rng, det=True)
    np.testing.assert_allclose(np.asarray(noremat), np.asarray(scanned),
                               rtol=0, atol=0)
    engine.cfg.shot_remat = True

    # shot_hoist_query=False routes the query rd/WA prep back inside the
    # per-shot body (the reference's per-shot recompute); deterministic
    # outputs must match the hoisted default exactly — same ops, only
    # where they run changes
    engine.cfg.shot_hoist_query = False
    unhoisted = engine._mmn_att_shots(
        {"params": trainables}, parts["fq_feats"], parts["fs_feats"],
        parts["f_q"], parts["f_s"], rng, det=True)
    np.testing.assert_allclose(np.asarray(unhoisted), np.asarray(scanned),
                               rtol=2e-6, atol=2e-7)

    # grads through the hoisted prep (a value the checkpointed scan body
    # CLOSES OVER, not an explicit arg) must equal the in-body ones — this
    # is the jax.checkpoint-closure path the hoist leans on
    def s(hoist):
        engine.cfg.shot_hoist_query = hoist
        return jax.grad(lambda tv: jnp.sum(engine._mmn_att_shots(
            {"params": tv}, parts["fq_feats"], parts["fs_feats"],
            parts["f_q"], parts["f_s"], rng, det=True)))(trainables)
    g_hoist, g_flat = s(True), s(False)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6), g_hoist, g_flat)
    engine.cfg.shot_hoist_query = True


def test_eval_split_prologue_equals_sequential():
    """eval_metrics_batch with the vmapped prologue == the all-sequential
    map — pure restructure, identical math."""
    import jax
    import jax.numpy as jnp

    from few_shot_seg_cwt_tpu.config import default_cfg
    from few_shot_seg_cwt_tpu.data.synthetic import make_episode_batch
    from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
    from few_shot_seg_cwt_tpu.train.common import init_backbone
    from few_shot_seg_cwt_tpu.train.train_head import init_head_trainables

    cfg = default_cfg()
    cfg.image_size = 33
    cfg.adapt_iter = 2
    cfg.rmid = "l34"
    cfg.att_wt = 0.2
    engine = HeadEngine(cfg, "mmn")
    vars_b = init_backbone(cfg, engine)
    trainables = init_head_trainables(cfg, engine, vars_b)

    host = make_episode_batch(seed=9, e=4, size=33, shot=1)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    rngs = jax.random.split(jax.random.PRNGKey(5), 4)

    seq = engine.eval_metrics_batch(trainables, vars_b, batch, rngs, None)

    cfg2 = cfg.clone()
    cfg2.eval_split_prologue = True
    engine2 = HeadEngine(cfg2, "mmn")
    got = engine2.eval_metrics_batch(trainables, vars_b, batch, rngs, None)

    for k in seq:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(seq[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
