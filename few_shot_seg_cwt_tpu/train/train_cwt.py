"""Stage-2 CWT meta-training (the paper's trainer).

CLI-compatible re-design of the reference trainer (reference: src/train.py):

    python -m few_shot_seg_cwt_tpu.train.train_cwt --config configs/pascal.yaml \
        --opts shot 1 train_split 0 [synthetic_data True debug True]

Differences by design:
* the whole episode step (backbone -> fused inner loop -> CWT -> loss ->
  transformer SGD update) is ONE jitted program, vmapped over
  ``episode_batch`` episodes (the reference is locked to batch_size 1 with
  ~203 Python-level backward passes per episode);
* multi-chip: the episode batch is sharded over the mesh data axis — this
  subsumes the reference's separate DDP trainer (src/train_ddp.py);
* checkpoints are orbax trees (best.ckpt / final.ckpt under the reference's
  directory schema).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np
import optax

from ..config import parse_args
from ..episodic.engine import EpisodicEngine
from ..eval.validate import validate_transformer
from ..parallel.mesh import shard_batch, to_host
from ..utils.ckpt import save_ckpt
from ..utils.meters import AverageMeter
from .common import (
    apply_debug,
    episodic_loaders,
    init_backbone,
    init_cwt,
    maybe_auto_resume,
    maybe_mesh,
    set_seeds,
    trans_ckpt_dir,
)
from .optim import build_optimizer


def _pack_train_state(trans_params, vars_t_extra, opt_state, key,
                      epoch: int, best: float):
    from ..utils.ckpt import pack_train_state

    model = dict(vars_t_extra)
    model["params"] = trans_params
    return pack_train_state(model, opt_state, key, epoch, best)


def main(cfg) -> float:
    from ..parallel.mesh import distributed_init
    from ..utils.logging import get_logger, log_to

    distributed_init(cfg)  # MUST precede any jax call on multi-host runs
    print = get_logger()  # noqa: A001 — tees to <save_dir>/log.txt once set below
    print(cfg)
    set_seeds(cfg)
    apply_debug(cfg)

    engine = EpisodicEngine(cfg)
    mesh = maybe_mesh(cfg)

    vars_b = init_backbone(cfg, engine)
    vars_t = init_cwt(cfg, engine)
    resume_full = False
    maybe_auto_resume(cfg, trans_ckpt_dir(cfg))
    if cfg.get("resume_ckpt"):
        from ..utils.ckpt import load_ckpt
        import numpy as _np

        print(f"=> resuming transformer from {cfg.resume_ckpt}")
        # full-train-state checkpoints (train_state.ckpt) carry model +
        # optimizer + epoch + rng, like the reference's
        # {'epoch','state_dict','optimizer'} saves (src/train.py:141-163);
        # model-only checkpoints (best/final) restore weights alone
        raw = load_ckpt(cfg.resume_ckpt)
        resume_full = isinstance(raw, dict) and "opt_state" in raw
        if resume_full:
            vars_t = raw["model"]  # typed restore happens below with `like`
        else:
            vars_t = load_ckpt(cfg.resume_ckpt,
                               like=jax.tree.map(_np.asarray, vars_t))
    trans_params = vars_t["params"]
    vars_t_extra = {k: v for k, v in vars_t.items() if k != "params"}

    # reference: get_optimizer(args, [dict(params=..., lr=trans_lr*scale_lr)]),
    # no scheduler in stage-2 (src/train.py:98)
    optimizer = build_optimizer(cfg, base_lr=cfg.trans_lr * cfg.scale_lr,
                                use_schedule=False)
    opt_state = optimizer.init(trans_params)
    train_step = engine.make_train_step(optimizer)            # metrics step
    # hot-loop step: loss-only (no 473px IoU tail); metrics are read every
    # 10th iteration only, so 90% of steps skip that compute entirely
    train_step_fast = engine.make_train_step(optimizer, with_metrics=False)

    train_loader, val_loader = episodic_loaders(cfg)
    save_dir = trans_ckpt_dir(cfg)
    if cfg.save_models:
        os.makedirs(save_dir, exist_ok=True)
        log_to(save_dir)
    else:
        log_to(None)  # don't inherit a previous run's tee destination

    iter_per_epoch = 5 * cfg.episode_batch if cfg.debug else min(
        cfg.iter_per_epoch, len(train_loader.dataset)
    )
    steps_per_epoch = max(1, iter_per_epoch // cfg.episode_batch)

    key = jax.random.PRNGKey(cfg.manual_seed or 0)
    max_val_miou = 0.0
    start_epoch = 0

    if resume_full:
        from ..utils.ckpt import load_ckpt

        # typed restore against a like-tree so optax's namedtuple state and
        # the rng key come back with their real structures/dtypes
        like = jax.tree.map(np.asarray, _pack_train_state(
            trans_params, vars_t_extra, opt_state, key, 0, 0.0))
        state = load_ckpt(cfg.resume_ckpt, like=like)
        trans_params = state["model"]["params"]
        vars_t_extra = {k: v for k, v in state["model"].items() if k != "params"}
        opt_state = state["opt_state"]
        key = jax.numpy.asarray(state["rng"])
        start_epoch = int(state["meta"]["epoch"])
        max_val_miou = float(state["meta"]["best"])
        print(f"=> resumed full train state at epoch {start_epoch} "
              f"(best {max_val_miou:.3f})")

    print("==> Start training")
    for epoch in range(start_epoch, cfg.epochs):
        train_loader.set_epoch(epoch)
        it = iter(train_loader)
        loss_meter = AverageMeter()
        iou_meter = AverageMeter()
        iou0_meter = AverageMeter()
        t0 = time.time()

        for i in range(steps_per_epoch):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(train_loader)
                batch = next(it)
            episodes = {k: batch[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}
            if mesh is not None:
                episodes = shard_batch(episodes, mesh)
            key, sub = jax.random.split(key)
            log_step = i % 10 == 0 or (epoch == 0 and i < 5)
            step_fn = train_step if log_step else train_step_fast
            trans_params, opt_state, metrics = step_fn(
                trans_params, opt_state, vars_t_extra, vars_b, episodes, sub
            )

            if log_step:
                # sample every 10th step for the epoch averages (a per-step
                # host sync would serialize dispatch over the device link);
                # to_host allgathers episode-sharded metrics on multi-host
                m = to_host(metrics)
                iou = (m["inter"] / (m["union"] + 1e-10)).mean()
                iou0 = (m["inter0"] / (m["union0"] + 1e-10)).mean()
                loss_meter.update(float(m["loss"]))
                iou_meter.update(float(iou))
                iou0_meter.update(float(iou0))
                if i % 100 == 0 or (epoch == 0 and i < 5):
                    print(
                        f"iter {i * cfg.episode_batch} loss {float(m['loss']):.4f} "
                        f"mIoU {iou:.3f} mIoU0 {iou0:.3f}"
                    )

        print(
            f"Epoch {epoch + 1}: mIoU {iou_meter.avg:.3f}, loss {loss_meter.avg:.3f}, "
            f"mIoU0 {iou0_meter.avg:.3f} ({time.time() - t0:.1f}s)"
        )

        vars_t_now = dict(vars_t_extra)
        vars_t_now["params"] = trans_params
        val_miou, val_loss = validate_transformer(
            cfg, engine, vars_b, vars_t_now, val_loader, mesh=mesh
        )

        if val_miou > max_val_miou:
            max_val_miou = val_miou
            if cfg.save_models:
                path = os.path.join(save_dir, "best.ckpt")
                print(f"Saving checkpoint to: {path}")
                save_ckpt(path, jax.tree.map(np.asarray, vars_t_now))
        if cfg.save_models:
            # full resumable state every epoch (model + optimizer + epoch +
            # rng — the reference saves optimizer state too, src/train.py:146)
            save_ckpt(
                os.path.join(save_dir, "train_state.ckpt"),
                jax.tree.map(np.asarray, _pack_train_state(
                    trans_params, vars_t_extra, opt_state, key,
                    epoch + 1, max_val_miou)),
            )
        print(f"=> Max_mIoU = {max_val_miou:.3f}")
        stop_after = cfg.get("stop_after_epochs")
        if stop_after and epoch - start_epoch + 1 >= int(stop_after):
            print(f"=> stop_after_epochs={stop_after}: exiting after epoch {epoch}")
            break

    if cfg.save_models:
        vars_t_now = dict(vars_t_extra)
        vars_t_now["params"] = trans_params
        save_ckpt(os.path.join(save_dir, "final.ckpt"),
                  jax.tree.map(np.asarray, vars_t_now))
    return max_val_miou


if __name__ == "__main__":
    main(parse_args("Training classifier weight transformer (TPU)"))
