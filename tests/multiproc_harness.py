"""Subprocess body for the 2-process multi-host simulation test.

Each process pins the CPU backend, joins a jax.distributed cluster over
localhost, builds a global mesh spanning both processes' virtual devices,
and runs one episodic train step + a sharded validation + a collective
checkpoint save — the full multi-host surface of the framework
(distributed_init ordering, host-local loaders with rank striding,
make_array_from_process_local_data batch assembly, process-gated logging,
collective orbax save, to_host allgather).

Run by tests/test_parallel.py::test_two_process_multihost; not a test itself.
Usage: python tests/multiproc_harness.py <process_id> <num_processes> <port> <tmpdir>
"""

import os
import sys


def main(pid: int, nproc: int, port: int, tmpdir: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from few_shot_seg_cwt_tpu.config import default_cfg
    from few_shot_seg_cwt_tpu.parallel import mesh as pmesh

    # the same entry the trainers use, driven via the env-style path
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    pmesh._distributed_initialized = True
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc  # global device view

    import numpy as np

    from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
    from few_shot_seg_cwt_tpu.eval.validate import validate_transformer
    from few_shot_seg_cwt_tpu.train.common import (
        episodic_loaders,
        init_backbone,
        init_cwt,
        maybe_mesh,
    )
    from few_shot_seg_cwt_tpu.train.optim import build_optimizer
    from few_shot_seg_cwt_tpu.utils.ckpt import save_ckpt
    from few_shot_seg_cwt_tpu.utils.logging import get_logger

    log = get_logger()

    cfg = default_cfg()
    cfg.pretrained = False
    cfg.image_size = 33
    cfg.adapt_iter = 2
    cfg.episode_batch = 4      # global; 2 per process
    cfg.test_num = 4
    cfg.n_runs = 1
    cfg.workers = 0
    cfg.synthetic_data = True
    cfg.iter_per_epoch = 2

    engine = EpisodicEngine(cfg)
    mesh = maybe_mesh(cfg)
    assert mesh is not None and mesh.devices.size == 2 * nproc

    vars_b = pmesh.replicate(init_backbone(cfg, engine), mesh)
    vars_t = pmesh.replicate(init_cwt(cfg, engine), mesh)

    train_loader, val_loader = episodic_loaders(cfg)
    assert train_loader.batch_size == 2 and val_loader.batch_size == 2
    assert val_loader.rank == pid and val_loader.world == nproc

    # one global train step from host-local batches
    optimizer = build_optimizer(cfg, base_lr=cfg.trans_lr, use_schedule=False)
    trans_params = vars_t["params"]
    vars_t_extra = {k: v for k, v in vars_t.items() if k != "params"}
    opt_state = pmesh.replicate(optimizer.init(jax.tree.map(np.asarray, trans_params)), mesh)
    step = engine.make_train_step(optimizer)
    batch = next(iter(train_loader))
    episodes = {k: batch[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}
    episodes = pmesh.shard_batch(episodes, mesh)
    assert episodes["q_img"].shape[0] == cfg.episode_batch  # global leading dim
    new_params, opt_state, metrics = step(
        trans_params, opt_state, vars_t_extra, vars_b, episodes, jax.random.PRNGKey(0)
    )
    loss = float(np.asarray(pmesh.to_host(metrics["loss"])))
    assert np.isfinite(loss), loss
    log(f"[proc {pid}] train loss {loss:.4f}")

    # sharded validation: global episode/rng assembly + allgathered metrics
    miou, vloss = validate_transformer(
        cfg, engine, vars_b, vars_t, val_loader, mesh=mesh, log=log
    )
    assert 0.0 <= miou <= 1.0 and np.isfinite(vloss)

    # collective checkpoint save: every process calls; orbax gates on primary
    save_ckpt(os.path.join(tmpdir, "ckpt"), jax.tree.map(np.asarray, pmesh.to_host(new_params)))
    assert os.path.isdir(os.path.join(tmpdir, "ckpt"))

    # --- the reference's DDP trainer analog: MMN head step + validation ---
    from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
    from few_shot_seg_cwt_tpu.train.train_head import (
        init_head_trainables,
        validate_head,
    )

    hcfg = type(cfg)({**cfg, "rmid": "l34", "temp": 20.0, "att_wt": 0.5})
    hengine = HeadEngine(hcfg, "mmn")
    h_vars_b = pmesh.replicate(
        init_backbone(type(hcfg)({**hcfg, "resume_weights": None}), hengine), mesh
    )
    trainables = pmesh.replicate(
        jax.tree.map(np.asarray, init_head_trainables(hcfg, hengine, h_vars_b)),
        mesh,
    )
    h_opt = build_optimizer(hcfg, base_lr=hcfg.trans_lr, use_schedule=False)
    h_state = pmesh.replicate(
        h_opt.init(jax.tree.map(np.asarray, trainables)), mesh
    )
    h_step = hengine.make_train_step(h_opt)
    batch = next(iter(train_loader))
    episodes = pmesh.shard_batch(
        {k: batch[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}, mesh
    )
    trainables, h_state, h_metrics = h_step(
        trainables, h_state, h_vars_b, episodes, jax.random.PRNGKey(3), None
    )
    h_loss = float(np.asarray(pmesh.to_host(h_metrics["loss_mean"])))
    assert np.isfinite(h_loss), h_loss
    miou_h, _, _ = validate_head(
        hcfg, hengine, trainables, h_vars_b, val_loader, mesh, None, log=log
    )
    assert 0.0 <= miou_h <= 1.0

    print(f"MULTIPROC_OK pid={pid} miou={miou:.4f} head_miou={miou_h:.4f}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
