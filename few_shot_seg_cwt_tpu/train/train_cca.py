"""Incremental multi-way CCA trainer (reference: src/train_cca.py).

CLI: python -m few_shot_seg_cwt_tpu.train.train_cca --config configs/pascal_cca.yaml

Uses the K-way incremental episodic classifier (base rows inherited from the
stage-1 head, novel slot re-initialized), pseudo-labeled support backgrounds,
Adapt_SegLoss inner loop, MMN refinement, and binary-compressed losses. The
adaptive variant (train_cca1) adds a host-side episode-adaptive relabel pass.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict

import jax
import numpy as np

from ..config import parse_args
from ..data.loader import infinite
from ..eval.validate import accumulate_fg_iou, exact_batch_sizes, fg_miou
from ..episodic.cca import CCAEngine, adaptive_relabel_batch, make_base_preds_fn
from ..parallel.mesh import shard_batch, to_host
from ..utils.ckpt import save_ckpt
from ..utils.meters import AverageMeter
from .common import (
    apply_debug,
    episodic_loaders,
    init_backbone,
    maybe_auto_resume,
    maybe_mesh,
    set_seeds,
)
from .optim import build_optimizer
from .train_head import EP_KEYS, init_head_trainables


def main(cfg, adaptive: bool = False) -> float:
    from ..parallel.mesh import distributed_init

    from ..utils.logging import get_logger, log_to

    distributed_init(cfg)  # MUST precede any jax call on multi-host runs
    print = get_logger()  # noqa: A001 — process-0-gated on multi-host
    print(cfg)
    set_seeds(cfg)
    apply_debug(cfg)
    assert cfg.num_classes_tr > 2, "cca needs a multi-way base classifier"

    engine = CCAEngine(cfg, adaptive=adaptive)
    mesh = maybe_mesh(cfg) if not adaptive else None
    # keep the stage-1 classifier: its rows are the CCA base-class weights
    vars_b = init_backbone(cfg, engine, skip_classifier=False)
    trainables = init_head_trainables(cfg, engine, vars_b)
    base_preds_fn = make_base_preds_fn(cfg, engine) if adaptive else None

    optimizer = build_optimizer(
        cfg, base_lr=cfg.trans_lr * cfg.scale_lr,
        iters_per_epoch=max(1, cfg.iter_per_epoch // cfg.episode_batch),
    )
    opt_state = optimizer.init(trainables)
    step = engine.make_train_step(optimizer)

    train_loader, val_loader = episodic_loaders(cfg)
    sv_path = os.path.join(
        "./results",
        f"cca{'1' if adaptive else ''}_{cfg.train_name}/{cfg.arch}{cfg.layers}/"
        f"split{cfg.train_split}_shot{cfg.shot}/{cfg.exp_name}",
    )
    os.makedirs(sv_path, exist_ok=True)
    log_to(sv_path)

    steps_per_epoch = 5 if cfg.debug else max(
        1, min(cfg.iter_per_epoch, len(train_loader.dataset)) // cfg.episode_batch
    )
    key = jax.random.PRNGKey(cfg.manual_seed or 0)
    best = 0.0
    start_epoch = 1

    maybe_auto_resume(cfg, sv_path)
    if cfg.get("resume_ckpt"):
        # full train-state resume (model + optimizer + epoch + rng) or plain
        # head weights — same protocol as train_head/train_cwt
        from ..utils.ckpt import (
            is_full_train_state,
            load_ckpt,
            pack_train_state,
            restore_train_state,
        )

        if is_full_train_state(str(cfg.resume_ckpt)):
            like = pack_train_state({"params": trainables}, opt_state, key, 0, 0.0)
            state = restore_train_state(str(cfg.resume_ckpt), like)
            trainables = state["model"]["params"]
            opt_state = state["opt_state"]
            key = jax.numpy.asarray(state["rng"])
            start_epoch = int(state["meta"]["epoch"]) + 1
            best = float(state["meta"]["best"])
            print(f"=> resumed full cca train state after epoch {start_epoch - 1} "
                  f"(best {best:.3f})")
        else:
            trainables = load_ckpt(
                str(cfg.resume_ckpt), like=jax.tree.map(np.asarray, trainables))
            print(f"=> resumed cca weights from {cfg.resume_ckpt}")

    print(f"==> Start training cca{'1' if adaptive else ''}")
    for epoch in range(start_epoch, cfg.epochs + 1):
        # per-epoch stream so the adaptive relabel noise is resume-exact
        relabel_rng = np.random.default_rng([cfg.manual_seed or 0, epoch])
        train_loader.set_epoch(epoch)
        it = iter(train_loader)
        loss_meter = AverageMeter()
        t0 = time.time()
        for i in range(1, steps_per_epoch + 1):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(train_loader)
                batch = next(it)
            episodes = {k: np.asarray(batch[k]) for k in EP_KEYS}
            if adaptive:
                episodes = adaptive_relabel_batch(
                    cfg, engine, vars_b, episodes, base_preds_fn, relabel_rng
                )
            if mesh is not None:
                episodes = shard_batch(episodes, mesh)
            key, sub = jax.random.split(key)
            trainables, opt_state, metrics = step(
                trainables, opt_state, vars_b, episodes, sub, None
            )
            if i % 10 == 0 or (epoch == 1 and i <= 2):
                m = to_host(metrics)
                iou1 = float((m["inter1"] / (m["union1"] + 1e-10)).mean())
                loss_meter.update(float(m["loss_mean"]))
                if i % 100 == 0 or (epoch == 1 and i <= 2):
                    print(f"Ep{epoch}/{i * cfg.episode_batch} loss {loss_meter.val:.3f} "
                          f"IoU1 {iou1:.3f}")
        print(f"==== Epoch {epoch}: loss {loss_meter.avg:.3f} ({time.time()-t0:.1f}s)")

        # validation: binary FG IoU per class (multi-host: global episode
        # count, per-process rng slices, episodes+rngs assembled via
        # shard_batch — same protocol as eval/validate.validate_transformer)
        acc_i, acc_u = defaultdict(float), defaultdict(float)
        stream = infinite(val_loader)
        e_local = val_loader.batch_size
        e_global = e_local * jax.process_count()
        batch_sizes = exact_batch_sizes(cfg.test_num, e_global)
        for b, valid_n in enumerate(batch_sizes):
            vb = next(stream)
            episodes = {k: np.asarray(vb[k]) for k in EP_KEYS}
            if adaptive:
                episodes = adaptive_relabel_batch(
                    cfg, engine, vars_b, episodes, base_preds_fn, relabel_rng
                )
            rngs = jax.random.split(
                jax.random.fold_in(
                    key, 7_000_000 + b * 65_537 + jax.process_index()
                ),
                e_local,
            )
            if mesh is not None:
                episodes = shard_batch(episodes, mesh)
                rngs = shard_batch(np.asarray(rngs), mesh)
            out = to_host(engine.eval_metrics_batch(
                trainables, vars_b, episodes, rngs, None))
            accumulate_fg_iou(acc_i, acc_u, out, suffix="1", limit=valid_n)
        miou = fg_miou(acc_i, acc_u)
        print(f"val: mIoU {miou:.4f}")
        if miou > best:
            best = miou
            if cfg.save_models:
                save_ckpt(os.path.join(sv_path, "best.ckpt"),
                          jax.tree.map(np.asarray, trainables))
        print(f"=> best mIoU {best:.3f}")
        if cfg.save_models:
            from ..utils.ckpt import pack_train_state

            save_ckpt(os.path.join(sv_path, "train_state.ckpt"), jax.tree.map(
                np.asarray, pack_train_state(
                    {"params": trainables}, opt_state, key, epoch, best)))
        stop_after = cfg.get("stop_after_epochs")
        if stop_after and epoch - start_epoch + 1 >= int(stop_after):
            print(f"=> stop_after_epochs={stop_after}: exiting after epoch {epoch}")
            break
    return best


if __name__ == "__main__":
    main(parse_args("incremental CCA trainer (TPU)"))
