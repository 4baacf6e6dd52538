"""Stage-1 base-class pretraining of the PSPNet backbone.

CLI-compatible re-design of the reference pretrainer (reference:
src/pretrain.py):

    python -m few_shot_seg_cwt_tpu.train.pretrain --config configs/pascal_pretrain.yaml

Semantics preserved: two parameter groups (backbone at lr, PPM/bottleneck/
classifier at lr*scale_lr, src:68-76); label-smoothing one-hot CE with
eps/(C-1) off-mass (src:196-218); optional mixup (beta(0.2, 0.2), src:202-215);
cosine schedule stepped per iteration (src:120-121); best-val-mIoU model
selection with standard or episodic validation (src:79-80).

TPU-native: the whole optimization step (forward with batch-stat BN, loss,
grads for both groups, update) is one jitted program. Data-parallel
pretraining shards the image batch over the mesh; under jit's global-array
semantics batch-stat BN normalizes over the GLOBAL batch regardless of the
sharding (XLA inserts the cross-device reductions), which IS the reference's
SyncBatchNorm semantics (src/train_ddp.py:106) — no axis_name plumbing
needed. Proven sharded-vs-unsharded to reduction-order rounding in
tests/test_parallel.py::test_pretrain_bn_syncbn_equivalence.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import parse_args
from ..data.episodic import StandardDataset
from ..data.loader import EpisodeLoader
from ..episodic.engine import EpisodicEngine
from ..eval.validate import episodic_validate
from ..models.pspnet import build_pspnet
from ..ops.losses import cross_entropy, smoothed_cross_entropy
from ..ops.metrics import intersection_and_union
from ..utils.ckpt import save_ckpt
from ..utils.meters import AverageMeter
from .common import apply_debug, episodic_dataset, maybe_mesh, set_seeds
from .optim import build_lr_schedule


def param_group_optimizer(cfg, params, iters_per_epoch: int):
    """Two-group SGD: trunk at lr, new modules at lr*scale_lr (both cosine)."""

    def group(base_lr):
        lr = build_lr_schedule(cfg, base_lr, iters_per_epoch)
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(learning_rate=lr, momentum=cfg.momentum, nesterov=cfg.nesterov),
        )

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "backbone" if path[0].key == "trunk" else "new", params
    )
    return optax.multi_transform(
        {"backbone": group(cfg.lr), "new": group(cfg.lr * cfg.scale_lr)}, labels
    )


def make_pretrain_step(model, optimizer, cfg):
    num_classes = cfg.num_classes_tr
    smoothing = 0.1 if cfg.smoothing else 0.0

    def one_hot_ce(logits, target):
        if smoothing > 0:
            return smoothed_cross_entropy(logits, target, num_classes, smoothing)
        return cross_entropy(logits, target)

    def loss_fn(params, batch_stats, img, gt, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        rng_drop, rng_mix, rng_perm = jax.random.split(rng, 3)
        if cfg.mixup:
            lam = jax.random.beta(rng_mix, 0.2, 0.2)
            perm = jax.random.permutation(rng_perm, img.shape[0])
            mixed = lam * img + (1.0 - lam) * img[perm]
            logits, mutated = model.apply(
                variables, mixed, train=True,
                rngs={"dropout": rng_drop}, mutable=["batch_stats"],
            )
            loss = lam * one_hot_ce(logits, gt) + (1.0 - lam) * one_hot_ce(logits, gt[perm])
        else:
            logits, mutated = model.apply(
                variables, img, train=True,
                rngs={"dropout": rng_drop}, mutable=["batch_stats"],
            )
            loss = one_hot_ce(logits, gt)
        return loss, (mutated["batch_stats"], logits)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def step(params, batch_stats, opt_state, img, gt, rng):
        (loss, (new_stats, logits)), grads = grad_fn(params, batch_stats, img, gt, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # NOTE: under mixup these are the mixed-image logits scored against
        # the unmixed gt — exactly what the reference logs (pretrain.py:126);
        # the train mIoU is indicative only, model selection uses validation
        inter, union, tgt = intersection_and_union(
            jnp.argmax(logits, -1), gt, num_classes
        )
        return params, new_stats, opt_state, {
            "loss": loss, "inter": inter, "union": union, "target": tgt,
        }

    return step


def make_standard_eval(cfg, model):
    """Jitted once; params/batch_stats are runtime arguments, not constants."""

    @jax.jit
    def eval_batch(params, batch_stats, img, gt):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, img, train=False
        )
        inter, union, _ = intersection_and_union(
            jnp.argmax(logits, -1), gt, cfg.num_classes_tr
        )
        return inter, union, cross_entropy(logits, gt)

    return eval_batch


def standard_validate(cfg, eval_batch, params, batch_stats, loader, log=print,
                      mesh=None) -> Tuple[float, float]:
    """Pixel mIoU over the val list at train-class indexing (src:222-249).

    Multi-host: the loader is rank-strided (disjoint slices) and each batch
    is assembled into a global sharded array, so the jitted I/U reduction
    returns identical REPLICATED sums on every host — all processes reach
    the same best-ckpt decision (collective saves must not diverge).
    """
    inters = np.zeros(cfg.num_classes_tr)
    unions = np.zeros(cfg.num_classes_tr)
    loss_meter = AverageMeter()
    for batch in loader:
        n = batch["label"].shape[0]
        if n < loader.batch_size:
            # pad the drop_last=False tail to the static batch size with
            # all-255 labels: ignored by I/U, keeps the jitted shape stable
            # (no tail recompile) and the mesh sharding divisible
            pad = loader.batch_size - n
            batch = {
                "img": np.concatenate(
                    [batch["img"], np.zeros((pad, *batch["img"].shape[1:]),
                                            batch["img"].dtype)], 0),
                "label": np.concatenate(
                    [batch["label"], np.full((pad, *batch["label"].shape[1:]),
                                             255, batch["label"].dtype)], 0),
            }
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(batch, mesh)
        inter, union, loss = jax.tree.map(
            np.asarray, eval_batch(params, batch_stats, batch["img"], batch["label"])
        )
        inters += inter
        unions += union
        loss_meter.update(float(loss))
    miou = float((inters / (unions + 1e-10)).mean())
    acc = float(inters.sum() / max(unions.sum(), 1e-10))
    log(f"Testing results: running loss {loss_meter.avg:.2f}, Acc {acc:.4f}, mIoU {miou:.4f}")
    return miou, loss_meter.avg


def main(cfg) -> float:
    from ..parallel.mesh import distributed_init

    from ..utils.logging import get_logger, log_to

    distributed_init(cfg)  # MUST precede any jax call on multi-host runs
    print = get_logger()  # noqa: A001 — process-0-gated on multi-host
    print(cfg)
    set_seeds(cfg)
    apply_debug(cfg)

    model = build_pspnet(cfg)
    probe = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(cfg.manual_seed or 0)}, probe, train=False
        )
    )()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if cfg.get("synthetic_data"):
        from ..data.synthetic import SyntheticEpisodicDataset

        class _Std:
            def __init__(self, n):  # synthetic multi-class records
                self.n = n
                self.size = cfg.image_size

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                r = np.random.default_rng(7 * self.n + i)
                img = r.normal(0, 0.5, (self.size, self.size, 3)).astype(np.float32)
                lab = r.integers(0, cfg.num_classes_tr, (self.size, self.size)).astype(np.int32)
                return {"img": img, "label": lab}

        train_ds, val_ds = _Std(64), _Std(16)
    else:
        train_ds = StandardDataset(cfg, train=True)
        val_ds = StandardDataset(cfg, train=False)

    # multi-host: DistributedSampler semantics — every process shuffles with
    # the SAME seed and takes a disjoint rank-strided slice, so the global
    # assembled batch covers the dataset exactly once per epoch (per-process
    # seed offsets would visit each image P times per epoch and could place
    # the same image twice in one global batch)
    from .common import _local_batch

    local_bs = _local_batch(int(cfg.batch_size))
    rank, world = jax.process_index(), jax.process_count()
    train_loader = EpisodeLoader(
        train_ds, batch_size=local_bs, shuffle=True, num_workers=cfg.workers,
        seed=cfg.manual_seed or 0, rank=rank, world=world,
    )
    val_loader = EpisodeLoader(
        val_ds, batch_size=local_bs, shuffle=False, num_workers=cfg.workers,
        drop_last=False, rank=rank, world=world,
    )

    iters_per_epoch = len(train_loader)
    optimizer = param_group_optimizer(cfg, params, iters_per_epoch)
    opt_state = optimizer.init(params)
    step = make_pretrain_step(model, optimizer, cfg)
    # data-parallel pretraining: shard the image batch over the device mesh.
    # Batch-stat BN reduces over the full GLOBAL batch under jit (SyncBN
    # semantics, src/train_ddp.py:106) — verified sharded-vs-unsharded by
    # tests/test_parallel.py::test_pretrain_bn_syncbn_equivalence
    mesh_cfg = cfg.clone()
    mesh_cfg.episode_batch = cfg.batch_size
    mesh = maybe_mesh(mesh_cfg)

    sv_path = os.path.join(
        "./results",
        f"pretrain_{cfg.train_name}/{cfg.arch}{cfg.layers}/"
        f"split{cfg.train_split}_shot{cfg.shot}/{cfg.exp_name}",
    )
    os.makedirs(sv_path, exist_ok=True)
    log_to(sv_path)
    from ..utils.tb import SummaryWriter

    writer = SummaryWriter(os.path.join(sv_path, "model"))

    # validation machinery built ONCE (rebuilding per epoch would retrace
    # and recompile the identical jitted programs every epoch)
    if cfg.get("episodic_val", False):
        # episodic validation adapts a fresh BINARY classifier regardless of
        # the pretraining head width (reference get_classifier(num_classes=2),
        # src/test.py:309)
        ep_cfg = cfg.clone()
        ep_cfg.num_classes_tr = 2
        ep_engine = EpisodicEngine(ep_cfg)
        # eval mesh sized for the EPISODE batch (the train mesh divides
        # batch_size, which may not divide episode_batch)
        ep_mesh = maybe_mesh(ep_cfg)
        from .common import episodic_val_loader

        ep_loader = episodic_val_loader(cfg)
    else:
        std_eval = make_standard_eval(cfg, model)

    key = jax.random.PRNGKey(cfg.manual_seed or 0)
    max_val_miou = 0.0
    start_epoch = 0

    from .common import maybe_auto_resume

    maybe_auto_resume(cfg, sv_path)
    if cfg.get("resume_ckpt"):
        # full train-state resume: model + BN stats + optimizer (incl. the
        # per-iter cosine position) + epoch + rng (reference saves
        # {'epoch','state_dict','optimizer'}, src/pretrain.py:148-160)
        from ..utils.ckpt import is_full_train_state, pack_train_state, restore_train_state

        if is_full_train_state(str(cfg.resume_ckpt)):
            like = pack_train_state(
                {"params": params, "batch_stats": batch_stats},
                opt_state, key, 0, 0.0,
            )
            state = restore_train_state(str(cfg.resume_ckpt), like)
            params = state["model"]["params"]
            batch_stats = state["model"]["batch_stats"]
            opt_state = state["opt_state"]
            key = jax.numpy.asarray(state["rng"])
            start_epoch = int(state["meta"]["epoch"])
            max_val_miou = float(state["meta"]["best"])
            print(f"=> resumed full pretrain state at epoch {start_epoch} "
                  f"(best {max_val_miou:.3f})")
        else:
            from ..utils.ckpt import load_ckpt

            restored = load_ckpt(str(cfg.resume_ckpt), like=jax.tree.map(
                np.asarray, {"params": params, "batch_stats": batch_stats}))
            params, batch_stats = restored["params"], restored["batch_stats"]
            print(f"=> resumed pretrain weights from {cfg.resume_ckpt}")

    print("==> Start training")
    for epoch in range(start_epoch, cfg.epochs):
        train_loader.set_epoch(epoch)
        loss_meter = AverageMeter()
        t0 = time.time()
        for i, batch in enumerate(train_loader, start=1):
            key, sub = jax.random.split(key)
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(batch, mesh)
            params, batch_stats, opt_state, metrics = step(
                params, batch_stats, opt_state, batch["img"], batch["label"], sub
            )
            if i % cfg.log_freq == 0:
                from ..parallel.mesh import to_host

                m = to_host(metrics)
                miou = float((m["inter"] / (m["union"] + 1e-10)).mean())
                loss_meter.update(float(m["loss"]))
                print(f"iter {i}/{epoch}: loss {float(m['loss']):.2f}, "
                      f"running loss {loss_meter.avg:.2f}, mIoU {miou:.4f}")
        print(f"===== Epoch {epoch}: running loss {loss_meter.avg:.2f} "
              f"({time.time() - t0:.1f}s) =====")
        writer.add_scalar("train_loss", loss_meter.avg, epoch)

        if cfg.get("episodic_val", False):
            ep_vars = {"params": params, "batch_stats": batch_stats}
            same_mesh = (
                ep_mesh is None or mesh is None
                or ep_mesh.devices.tolist() == mesh.devices.tolist()
            )
            if ep_mesh is not None and not same_mesh:
                # the eval mesh can be smaller than the train mesh (it must
                # divide episode_batch, not batch_size); re-place variables
                # on it so the jitted program sees one device set.
                # device_put moves device->device — no host round trip
                from ..parallel.mesh import replicate

                ep_vars = replicate(ep_vars, ep_mesh)
            val_miou, _ = episodic_validate(
                ep_cfg, ep_engine, ep_vars, ep_loader, mesh=ep_mesh, log=print,
            )
        else:
            val_miou, _ = standard_validate(cfg, std_eval, params, batch_stats,
                                            val_loader, log=print, mesh=mesh)
        writer.add_scalar("mean_iou/val", val_miou, epoch)

        if val_miou > max_val_miou:
            max_val_miou = val_miou
            if cfg.save_models:
                path = os.path.join(sv_path, "best.ckpt")
                print(f"=> Max_mIoU = {max_val_miou:.3f}, saving to {path}")
                save_ckpt(path, jax.tree.map(
                    np.asarray, {"params": params, "batch_stats": batch_stats}
                ))
        if cfg.save_models:
            # full resumable state every epoch (the long stage-1 runs are the
            # ones that need preemption recovery most)
            from ..utils.ckpt import pack_train_state

            save_ckpt(os.path.join(sv_path, "train_state.ckpt"), jax.tree.map(
                np.asarray, pack_train_state(
                    {"params": params, "batch_stats": batch_stats},
                    opt_state, key, epoch + 1, max_val_miou)))
        stop_after = cfg.get("stop_after_epochs")
        if stop_after and epoch - start_epoch + 1 >= int(stop_after):
            print(f"=> stop_after_epochs={stop_after}: exiting after epoch {epoch}")
            break

    if cfg.save_models:
        save_ckpt(os.path.join(sv_path, "final.ckpt"), jax.tree.map(
            np.asarray, {"params": params, "batch_stats": batch_stats}
        ))
    writer.close()
    return max_val_miou


if __name__ == "__main__":
    main(parse_args("Stage-1 base pretraining (TPU)"))
