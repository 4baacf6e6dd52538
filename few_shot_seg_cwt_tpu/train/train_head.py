"""Generic trainer for the extension heads (MMN/DeTr/Match/CHM/Att/Asy/Fuse).

One trainer subsumes the reference's per-head scripts — their episode loops
are identical up to the head forward (see episodic.heads). CLI:

    python -m few_shot_seg_cwt_tpu.train.train_head --config configs/pascal_mmn.yaml \
        --opts head mmn [synthetic_data True ...]

Thin aliases keep the reference entry-point names:
train_kshot (mmn), train_ddp (mmn over the device mesh — mesh parallelism is
automatic here), train_trans (detr), train_match (nc->match / chm), train_att
(att), train_asy (asy), train_fuse (fuse), train_aug (mmn + meta-aug data).

Model selection follows the reference's dual criterion (best mIoU of the
blended prediction, best mIoU1 of the attention-only prediction ->
best.ckpt / best1.ckpt, src/train_trans.py:202-215).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Optional

import jax
import numpy as np

from ..config import parse_args
from ..data.loader import infinite
from ..eval.validate import accumulate_fg_iou, exact_batch_sizes, fg_miou
from ..episodic.heads import HeadEngine
from ..parallel.mesh import shard_batch, to_host
from ..utils.ckpt import save_ckpt
from ..utils.meters import AverageMeter, CompareMeter
from .common import (
    apply_debug,
    episodic_loaders,
    init_backbone,
    maybe_auto_resume,
    maybe_mesh,
    set_seeds,
)
from .optim import build_optimizer

EP_KEYS = ("s_img", "s_label", "q_img", "q_label", "cls")


def init_frozen_match(cfg, engine: HeadEngine):
    """The fuse head's frozen pretrained MatchNet (src/train_fuse.py:100):
    imported from cfg.matchnet_ckpt when present, random init otherwise."""
    fm_path = cfg.get("matchnet_ckpt", None)
    if fm_path and os.path.exists(str(fm_path)):
        from ..utils.ckpt import import_matchnet, load_torch_checkpoint

        return import_matchnet(load_torch_checkpoint(fm_path))
    import jax.numpy as jnp

    h = (cfg.image_size - 1) // 8 + 1
    corr = jnp.zeros((1, h, h, h, h, 1), jnp.float32)
    fs = jnp.zeros((1, h, h, cfg.bottleneck_dim), jnp.float32)
    return engine.frozen_match.init(
        jax.random.PRNGKey(3), corr, fs,
        method=engine.frozen_match.corr_forward,
    )


def init_head_trainables(cfg, engine: HeadEngine, vars_b):
    """Initialize head params by tracing one (tiny) episode."""
    import jax.numpy as jnp

    if engine.head_type == "asy":
        return jnp.asarray(0.2, jnp.float32)  # the gamma scalar

    size = cfg.image_size
    dummy = {
        "s_img": jnp.zeros((cfg.shot, size, size, 3), jnp.float32),
        "s_label": jnp.zeros((cfg.shot, size, size), jnp.int32),
        "q_img": jnp.zeros((size, size, 3), jnp.float32),
        "q_label": jnp.zeros((size, size), jnp.int32),
        "cls": jnp.asarray(1, jnp.int32),
    }
    if getattr(engine, "adaptive", False):
        dummy["w0"] = jnp.zeros((cfg.num_classes_tr, cfg.bottleneck_dim), jnp.float32)
        dummy["row_mask"] = jnp.ones((cfg.num_classes_tr,), bool)

    def init_fn(rng, vb, dm):
        # reuse the engine prologue (with a 1-step inner loop for speed).
        # vars_b/dummy enter as jit ARGUMENTS: as closure constants XLA
        # constant-folds the whole backbone forward at compile time, which
        # takes minutes per conv on the CPU backend.
        short_cfg_steps = engine.cfg.adapt_iter
        engine.cfg.adapt_iter = 1
        parts = engine.episode_parts(vb, dm, rng)
        engine.cfg.adapt_iter = short_cfg_steps
        return parts

    parts = jax.jit(init_fn)(jax.random.PRNGKey(0), vars_b, dummy)
    rng = jax.random.PRNGKey(1)
    ht = engine.head_type
    # assemble the init arguments per head, then run Module.init under ONE
    # jit: eager init dispatches hundreds of ops one by one, which is
    # pathologically slow on a remote/high-latency device transport
    if ht in ("mmn", "detr"):
        init_args = (parts["fq_feats"], parts["fs_feats"],
                     parts["f_q"], parts["f_s"])
    elif ht in ("match", "chm"):
        fq_fea, fs_fea = engine._stage_features(parts)
        if ht == "chm":
            from ..ops.resize import upsample_bilinear_ac

            h = fq_fea.shape[1]
            fq_fea = upsample_bilinear_ac(fq_fea, (h // 2, h // 2))
            fs_fea = upsample_bilinear_ac(fs_fea, (h // 2, h // 2))
        init_args = (fq_fea, fs_fea, parts["f_s"])
    elif ht == "att":
        fq_fea, fs_fea = engine._stage_features(parts)
        b, h, w, dk = fq_fea.shape
        shot = fs_fea.shape[0]
        q = fq_fea.reshape(1, h * w, dk)
        k = fs_fea.reshape(1, shot * h * w, dk)
        vv = parts["f_s"].reshape(1, shot * h * w, -1)
        idt = parts["f_q"].reshape(1, h * w, -1)
        init_args = (k, vv, q, idt, None)
    elif ht == "fuse":
        import jax.numpy as jnp

        im = engine.head.im_size
        h = parts["f_q"].shape[1]
        corr = jnp.zeros((1, h, h, h, h), jnp.float32)
        s_mask = jnp.zeros((1, im, im, 1), jnp.float32)
        pd = jnp.zeros((1, h, h, 2), jnp.float32)
        init_args = ([corr, corr], s_mask, [pd, pd])
    else:
        raise ValueError(ht)
    v = jax.jit(engine.head.init)(rng, *init_args)
    return v["params"]


def validate_head(cfg, engine: HeadEngine, trainables, vars_b, loader,
                  mesh=None, frozen_vars=None, log=print):
    """Per-class FG-IoU eval for both the blended and attention predictions."""
    e_local = loader.batch_size                       # per-process episodes
    e_batch = e_local * jax.process_count()           # global episodes/step
    batch_sizes = exact_batch_sizes(cfg.test_num, e_batch)
    key = jax.random.PRNGKey(cfg.manual_seed or 0)
    acc = {k: defaultdict(float) for k in ("i", "u", "i1", "u1")}
    loss_meter = AverageMeter()
    stream = infinite(loader)
    for b, valid_n in enumerate(batch_sizes):
        batch = next(stream)
        episodes = {k: batch[k] for k in EP_KEYS}
        if mesh is not None:
            episodes = shard_batch(episodes, mesh)
        rngs = jax.random.split(
            jax.random.fold_in(key, b * 65_537 + jax.process_index()), e_local
        )
        if mesh is not None:
            rngs = shard_batch(np.asarray(rngs), mesh)
        out = to_host(engine.eval_metrics_batch(
            trainables, vars_b, episodes, rngs, frozen_vars))
        accumulate_fg_iou(acc["i"], acc["u"], out, limit=valid_n)
        accumulate_fg_iou(acc["i1"], acc["u1"], out, suffix="1", limit=valid_n)
        loss_meter.update(float(out["loss"][:valid_n].mean()), n=valid_n)
    miou = fg_miou(acc["i"], acc["u"])
    miou1 = fg_miou(acc["i1"], acc["u1"])
    log(f"val: mIoU {miou:.4f} mIoU1 {miou1:.4f} loss {loss_meter.avg:.4f}")
    return miou, miou1, loss_meter.avg


def main(cfg, head_type: Optional[str] = None) -> float:
    from ..parallel.mesh import distributed_init
    from ..utils.logging import get_logger, log_to

    distributed_init(cfg)  # MUST precede any jax call on multi-host runs
    print = get_logger()  # noqa: A001 — tees to <sv_path>/log.txt once set below
    print(cfg)
    set_seeds(cfg)
    apply_debug(cfg)
    head_type = head_type or cfg.get("head", "mmn")

    engine = HeadEngine(cfg, head_type)
    mesh = maybe_mesh(cfg)
    vars_b = init_backbone(cfg, engine)
    trainables = init_head_trainables(cfg, engine, vars_b)
    frozen_vars = init_frozen_match(cfg, engine) if head_type == "fuse" else None

    optimizer = build_optimizer(
        cfg, base_lr=cfg.trans_lr * cfg.scale_lr,
        iters_per_epoch=max(1, cfg.iter_per_epoch // cfg.episode_batch),
    )
    opt_state = optimizer.init(trainables)
    step = engine.make_train_step(optimizer)

    train_loader, val_loader = episodic_loaders(cfg)
    sv_path = os.path.join(
        "./results",
        f"{head_type}_{cfg.train_name}/{cfg.arch}{cfg.layers}/"
        f"split{cfg.train_split}_shot{cfg.shot}/{cfg.exp_name}",
    )
    os.makedirs(sv_path, exist_ok=True)
    log_to(sv_path)

    steps_per_epoch = 5 if cfg.debug else max(
        1, min(cfg.iter_per_epoch, len(train_loader.dataset)) // cfg.episode_batch
    )
    key = jax.random.PRNGKey(cfg.manual_seed or 0)
    best, best1 = 0.0, 0.0
    start_epoch = 1

    maybe_auto_resume(cfg, sv_path)
    if cfg.get("resume_ckpt"):
        # full train-state resume (model + optimizer + epoch + rng — the
        # reference saves {'epoch','state_dict','optimizer'},
        # src/train_trans.py:202-215) or plain head weights
        from ..utils.ckpt import (
            is_full_train_state,
            load_ckpt,
            pack_train_state,
            restore_train_state,
        )

        if is_full_train_state(str(cfg.resume_ckpt)):
            like = pack_train_state(
                {"params": trainables}, opt_state, key, 0, 0.0, best1=0.0)
            state = restore_train_state(str(cfg.resume_ckpt), like)
            trainables = state["model"]["params"]
            opt_state = state["opt_state"]
            key = jax.numpy.asarray(state["rng"])
            start_epoch = int(state["meta"]["epoch"]) + 1
            best = float(state["meta"]["best"])
            best1 = float(state["meta"]["best1"])
            print(f"=> resumed full head train state after epoch {start_epoch - 1} "
                  f"(best {best:.3f} best1 {best1:.3f})")
        else:
            trainables = load_ckpt(
                str(cfg.resume_ckpt), like=jax.tree.map(np.asarray, trainables))
            print(f"=> resumed head weights from {cfg.resume_ckpt}")

    print(f"==> Start training head '{head_type}'")
    for epoch in range(start_epoch, cfg.epochs + 1):
        train_loader.set_epoch(epoch)
        it = iter(train_loader)
        loss_meter = AverageMeter()
        compare = CompareMeter()
        t0 = time.time()
        for i in range(1, steps_per_epoch + 1):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(train_loader)
                batch = next(it)
            episodes = {k: batch[k] for k in EP_KEYS}
            if mesh is not None:
                episodes = shard_batch(episodes, mesh)
            key, sub = jax.random.split(key)
            trainables, opt_state, metrics = step(
                trainables, opt_state, vars_b, episodes, sub, frozen_vars
            )
            if i % 10 == 0 or (epoch == 1 and i <= 2):
                m = to_host(metrics)
                iou1 = float((m["inter1"] / (m["union1"] + 1e-10)).mean())
                iou0 = float((m["inter0"] / (m["union0"] + 1e-10)).mean())
                loss_meter.update(float(m["loss_mean"]))
                compare.update(iou1, iou0)
                if i % 100 == 0 or (epoch == 1 and i <= 2):
                    print(f"Ep{epoch}/{i * cfg.episode_batch} loss {loss_meter.val:.3f} "
                          f"IoU1 {iou1:.3f} IoU0 {iou0:.3f}")
        print(f"==== Epoch {epoch}: loss {loss_meter.avg:.3f} "
              f"({time.time() - t0:.1f}s) ====")

        miou, miou1, _ = validate_head(
            cfg, engine, trainables, vars_b, val_loader, mesh, frozen_vars
        )
        if miou > best:
            best = miou
            if cfg.save_models:
                save_ckpt(os.path.join(sv_path, "best.ckpt"),
                          jax.tree.map(np.asarray, trainables))
        if miou1 > best1:
            best1 = miou1
            if cfg.save_models:
                save_ckpt(os.path.join(sv_path, "best1.ckpt"),
                          jax.tree.map(np.asarray, trainables))
        print(f"=> best mIoU {best:.3f} best mIoU1 {best1:.3f}")
        if cfg.save_models:
            from ..utils.ckpt import pack_train_state

            save_ckpt(os.path.join(sv_path, "train_state.ckpt"), jax.tree.map(
                np.asarray, pack_train_state(
                    {"params": trainables}, opt_state, key, epoch, best,
                    best1=best1)))
        stop_after = cfg.get("stop_after_epochs")
        if stop_after and epoch - start_epoch + 1 >= int(stop_after):
            print(f"=> stop_after_epochs={stop_after}: exiting after epoch {epoch}")
            break

    if cfg.save_models:
        save_ckpt(os.path.join(sv_path, "final.ckpt"),
                  jax.tree.map(np.asarray, trainables))
    return best


if __name__ == "__main__":
    main(parse_args("Extension-head episodic training (TPU)"))
