"""Mesh data-parallelism: sharded episode batches match single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from few_shot_seg_cwt_tpu.config import default_cfg
from few_shot_seg_cwt_tpu.data.synthetic import make_episode_batch
from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
from few_shot_seg_cwt_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from few_shot_seg_cwt_tpu.train import build_optimizer


@pytest.fixture(scope="module")
def setup():
    cfg = default_cfg()
    cfg.image_size = 33
    cfg.adapt_iter = 3
    engine = EpisodicEngine(cfg)
    probe = jnp.zeros((1, 33, 33, 3), jnp.float32)
    vars_b = engine.backbone.init({"params": jax.random.PRNGKey(0)}, probe, train=False)
    d = cfg.bottleneck_dim
    vars_t = engine.cwt.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2, d)),
        jnp.zeros((1, 4, 4, d)), jnp.zeros((1, 4, 4, d)),
    )
    return cfg, engine, vars_b, vars_t


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8  # conftest XLA_FLAGS


def test_sharded_eval_matches_unsharded(setup):
    cfg, engine, vars_b, vars_t = setup
    e = 8
    host = make_episode_batch(seed=3, e=e, size=33, shot=1)
    episodes = {k: host[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}
    rngs = jax.random.split(jax.random.PRNGKey(5), e)

    ref = jax.tree.map(
        np.asarray, engine.eval_metrics_batch(vars_b, vars_t, episodes, rngs)
    )

    mesh = make_mesh([8], ("data",))
    sharded = shard_batch(episodes, mesh)
    rngs_s = shard_batch(np.asarray(rngs), mesh)
    got = jax.tree.map(
        np.asarray,
        engine.eval_metrics_batch(
            replicate(vars_b, mesh), replicate(vars_t, mesh), sharded, rngs_s
        ),
    )
    np.testing.assert_allclose(got["inter"], ref["inter"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got["union"], ref["union"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got["loss"], ref["loss"], rtol=1e-4, atol=1e-5)


def test_sharded_train_step_matches_unsharded(setup):
    cfg, engine, vars_b, vars_t = setup
    opt = build_optimizer(cfg, base_lr=0.05, use_schedule=False)
    step = engine.make_train_step(opt)

    e = 8
    host = make_episode_batch(seed=4, e=e, size=33, shot=1)
    episodes = {k: host[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}
    params = vars_t["params"]
    key = jax.random.PRNGKey(9)

    p_ref, _, m_ref = step(params, opt.init(params), {}, vars_b, episodes, key)

    mesh = make_mesh([8], ("data",))
    p0 = replicate(params, mesh)
    got = step(
        p0, replicate(opt.init(params), mesh), {},
        replicate(vars_b, mesh), shard_batch(episodes, mesh), key,
    )
    p_got, _, m_got = got
    np.testing.assert_allclose(
        float(m_got["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p_got, jax.tree.map(jnp.asarray, p_ref)
    )
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_validate_transformer_with_mesh(setup):
    """Full validate loop under a mesh: episodes AND rngs assembled globally.

    Regression: the vmapped metrics program maps one axis size across all
    batched inputs — host-local rng arrays must go through shard_batch like
    the episodes (multi-host would crash with inconsistent vmap sizes).
    """
    cfg, engine, vars_b, vars_t = setup
    from few_shot_seg_cwt_tpu.data.loader import EpisodeLoader
    from few_shot_seg_cwt_tpu.data.synthetic import SyntheticEpisodicDataset
    from few_shot_seg_cwt_tpu.eval.validate import validate_transformer

    vcfg = cfg.clone()
    vcfg.test_num = 8
    vcfg.n_runs = 1
    loader = EpisodeLoader(
        SyntheticEpisodicDataset(vcfg, length=16, seed=5),
        batch_size=8, shuffle=False, num_workers=0,
    )
    mesh = make_mesh([8], ("data",))
    miou, loss = validate_transformer(
        vcfg, engine, vars_b, vars_t, loader, mesh=mesh, log=lambda *a: None
    )
    assert 0.0 <= miou <= 1.0 and np.isfinite(loss)


def test_pretrain_bn_syncbn_equivalence():
    """Live-BN stage-1 pretraining sharded over the mesh == unsharded on the
    same global batch — the SyncBN proof (reference src/train_ddp.py:106
    nn.SyncBatchNorm): under jit's global-array semantics, batch-stat BN
    normalizes over the GLOBAL batch regardless of how it is sharded; XLA
    inserts the cross-device reductions, no axis_name plumbing involved.

    Bit-identity is not attainable and not the right bar: sharding a batch
    reduction reassociates the f32 sums, and this network's backward
    amplifies reassociation rounding through 1/sqrt(var+eps) of
    near-degenerate BN variances (the PPM's pooled bins at init). Measured
    discriminator: PERMUTING the unsharded batch — mathematically a no-op
    through BN and the mean loss — deviates the one-step grads by the same
    ~2e-2 max as sharding does. The assertion is therefore self-calibrating:
    the sharded step must agree with the unsharded step at least as well as
    the unsharded step agrees with its own batch-permuted rerun (x3 slack),
    plus tight absolute agreement on loss and the BN batch_stats themselves.
    """
    from few_shot_seg_cwt_tpu.models.pspnet import build_pspnet
    from few_shot_seg_cwt_tpu.train.pretrain import (make_pretrain_step,
                                                     param_group_optimizer)

    cfg = default_cfg()
    cfg.image_size = 33
    cfg.num_classes_tr = 16
    cfg.mixup = False
    cfg.dropout = 0.0  # permuting the batch must stay a semantic no-op
    model = build_pspnet(cfg)
    probe = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, probe, train=False)
    )()
    params, batch_stats = variables["params"], variables["batch_stats"]
    optimizer = param_group_optimizer(cfg, params, iters_per_epoch=4)
    opt_state = optimizer.init(params)
    step = make_pretrain_step(model, optimizer, cfg)

    r = np.random.default_rng(21)
    img = r.normal(0, 0.5, (16, 33, 33, 3)).astype(np.float32)
    gt = r.integers(0, 16, (16, 33, 33)).astype(np.int32)
    key = jax.random.PRNGKey(13)

    p_ref, bs_ref, _, m_ref = step(params, batch_stats, opt_state, img, gt, key)

    # reassociation calibrator: same math, batch order permuted
    perm = np.asarray(np.random.default_rng(5).permutation(16))
    p_perm, bs_perm, _, m_perm = step(
        params, batch_stats, opt_state, img[perm], gt[perm], key)

    mesh = make_mesh([8], ("data",))
    p_got, bs_got, _, m_got = step(
        replicate(params, mesh), replicate(batch_stats, mesh),
        replicate(opt_state, mesh),
        shard_batch(img, mesh), shard_batch(gt, mesh), key,
    )

    def tree_max_dev(a, b):
        return max(float(jnp.abs(jnp.asarray(x) - jnp.asarray(y)).max())
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    np.testing.assert_allclose(np.asarray(m_got["loss"]),
                               np.asarray(m_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_perm["loss"]),
                               np.asarray(m_ref["loss"]), rtol=1e-5)

    # BN's accumulated running stats agree tightly (the direct SyncBN claim)
    assert tree_max_dev(bs_got, bs_ref) < 5e-4
    # and the full updated param tree deviates no more than the benign
    # reassociation envelope (floor guards a degenerate 0-deviation perm)
    envelope = max(tree_max_dev(p_perm, p_ref), 1e-6)
    dev = tree_max_dev(p_got, p_ref)
    assert dev <= 3.0 * envelope, (dev, envelope)


@pytest.mark.slow  # the driver runs dryrun_multichip directly every round
def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_forward_compiles():
    import __graft_entry__ as g

    fn, (variables, x) = g.entry()
    # compile-check at a smaller spatial size to keep CPU CI fast
    small = jnp.zeros((1, 65, 65, 3), jnp.float32)
    out = jax.jit(fn)(variables, small)
    assert out.shape == (1, 65, 65, 2)


@pytest.mark.slow
def test_two_process_multihost(tmp_path):
    """REAL 2-process jax.distributed run over localhost: train step +
    sharded validation + collective checkpoint, per-process logs gated.

    This is the closest a single machine gets to a multi-host TPU slice:
    each subprocess owns 2 virtual CPU devices, the mesh spans all 4, and
    episode batches are assembled from host-local loader slices via
    make_array_from_process_local_data.
    """
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    harness = os.path.join(os.path.dirname(__file__), "multiproc_harness.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, harness, str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MULTIPROC_OK pid={pid}" in out
    # process-0 logging gate: only proc 0 prints the validate lines
    assert "mIoU---Val result" in outs[0]
    assert "mIoU---Val result" not in outs[1]


def test_sharded_kshot_head_step_matches_unsharded():
    """Mesh DP composed with the per-shot MMN scan (_mmn_att_shots): a
    2-shot head train step sharded over the 8-device mesh must match the
    unsharded step exactly."""
    from few_shot_seg_cwt_tpu.config import default_cfg
    from few_shot_seg_cwt_tpu.data.synthetic import make_episode_batch
    from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
    from few_shot_seg_cwt_tpu.train.train_head import init_head_trainables

    cfg = default_cfg()
    cfg.image_size = 33
    cfg.adapt_iter = 2
    cfg.shot = 2
    cfg.rmid = "l34"
    cfg.att_wt = 0.2
    engine = HeadEngine(cfg, "mmn")
    probe = jnp.zeros((1, 33, 33, 3), jnp.float32)
    vars_b = engine.backbone.init(
        {"params": jax.random.PRNGKey(0)}, probe, train=False)
    trainables = init_head_trainables(cfg, engine, vars_b)
    opt = build_optimizer(cfg, base_lr=0.05, use_schedule=False)
    step = engine.make_train_step(opt)

    e = 8
    host = make_episode_batch(seed=5, e=e, size=33, shot=2)
    episodes = {k: host[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}
    key = jax.random.PRNGKey(11)

    t_ref, _, m_ref = step(trainables, opt.init(trainables), vars_b,
                           episodes, key, None)

    mesh = make_mesh([8], ("data",))
    t_got, _, m_got = step(
        replicate(trainables, mesh), replicate(opt.init(trainables), mesh),
        replicate(vars_b, mesh), shard_batch(episodes, mesh), key, None,
    )
    np.testing.assert_allclose(float(m_got["loss_mean"]),
                               float(m_ref["loss_mean"]), rtol=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        t_got, jax.tree.map(jnp.asarray, t_ref))
    assert max(jax.tree.leaves(diffs)) < 1e-5
