"""Episodic evaluation loops (the protocol that defines all baselines).

Parity with the reference (reference: src/test.py:103-254):
``n_runs`` runs x ``test_num`` episodes; per-class foreground
intersection/union accumulated over episodes (background never counted,
src:227); per-class IoU = I/U; run mIoU = mean over classes; final score =
mean over runs; wall-clock per run reported.

Device/host split: episodes stream through the jitted
``EpisodicEngine.eval_metrics_batch`` (inner loop + CWT + upsample + argmax +
I/U all on device, sharded over the mesh data axis when one is given); only
(E, num_classes) metric arrays and episode class ids reach the host, where the
tiny per-class accumulation runs.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ..data.loader import EpisodeLoader, infinite
from ..parallel.mesh import shard_batch, to_host
from ..utils.meters import AverageMeter


def _episode_fields(batch: Dict) -> Dict:
    return {k: batch[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}


def accumulate_fg_iou(inter_acc: Dict[int, float], union_acc: Dict[int, float],
                      out: Dict, suffix: str = "",
                      limit: Optional[int] = None) -> None:
    """Per-class foreground I/U accumulation shared by all validators.

    ``limit`` scores only the first N episodes of the batch — the tail batch
    of an exact-count protocol carries filler episodes past ``test_num``.
    """
    classes = out["cls"]
    inter = out[f"inter{suffix}"]
    union = out[f"union{suffix}"]
    n = len(classes) if limit is None else min(limit, len(classes))
    for i in range(n):
        c = int(classes[i])
        inter_acc[c] += float(inter[i, 1])
        union_acc[c] += float(union[i, 1])


def exact_batch_sizes(test_num: int, e_batch: int):
    """Per-batch valid-episode counts so exactly ``test_num`` episodes score.

    The reference runs exact counts (its batch_size_val divides test_num,
    src/test.py:138); with a vmapped episode batch the last program invocation
    is padded by the infinite loader stream and the overflow masked here.
    """
    sizes = [e_batch] * (max(test_num, 1) // e_batch)
    rem = max(test_num, 1) - sum(sizes)
    if rem:
        sizes.append(rem)
    return sizes


def fg_miou(inter_acc: Dict[int, float], union_acc: Dict[int, float]) -> float:
    if not union_acc:
        return 0.0
    return float(np.mean(
        [inter_acc[c] / (union_acc[c] + 1e-10) for c in union_acc]
    ))


def validate_transformer(
    cfg,
    engine,
    vars_b,
    vars_t,
    loader: EpisodeLoader,
    mesh=None,
    log=print,
) -> Tuple[float, float]:
    """Full CWT evaluation; returns (mean mIoU over runs, mean loss)."""
    test_num = cfg.test_num
    e_local = loader.batch_size                       # per-process episodes
    e_batch = e_local * jax.process_count()           # global episodes/step
    batch_sizes = exact_batch_sizes(test_num, e_batch)
    base_key = jax.random.PRNGKey(cfg.manual_seed if cfg.manual_seed is not None else 0)

    run_mious = np.zeros(cfg.n_runs)
    run_losses = np.zeros(cfg.n_runs)
    runtimes = np.zeros(cfg.n_runs)

    # replay mode: the recorded stream is one continuous walk across runs
    # (the reference's loader iterator persists between runs,
    # src/test.py:150-153) — run R must start at episode R*test_num exactly,
    # so the batch size must not consume filler episodes across the boundary
    replaying = bool(cfg.get("replay"))
    if replaying:
        assert test_num % e_batch == 0, (
            f"replay: episode_batch {e_batch} must divide test_num {test_num} "
            "so run boundaries match the recorded stream (use e.g. 8, 20, 40)"
        )
    persistent_stream = infinite(loader) if replaying else None

    profile_dir = cfg.get("profile_dir")
    if profile_dir:
        from jax import profiler as _profiler

        _profiler.start_trace(profile_dir)

    for run in range(cfg.n_runs):
        cls_inter: Dict[int, float] = defaultdict(float)
        cls_union: Dict[int, float] = defaultdict(float)
        cls_inter0: Dict[int, float] = defaultdict(float)
        cls_union0: Dict[int, float] = defaultdict(float)
        loss_meter = AverageMeter()
        stream = persistent_stream if replaying else infinite(loader)
        t_run = 0.0
        seen = 0

        for b, valid_n in enumerate(batch_sizes):
            batch = next(stream)
            episodes = _episode_fields(batch)
            if mesh is not None:
                episodes = shard_batch(episodes, mesh)
            rngs = jax.random.fold_in(
                base_key, (run * 1_000_003 + b) * 65_537 + jax.process_index()
            )
            rngs = jax.random.split(rngs, e_local)
            if mesh is not None:
                # assemble the per-process rng slices into the same global
                # (e_batch, ...) layout as the episodes — the vmapped program
                # maps one axis size across all its batched inputs
                rngs = shard_batch(np.asarray(rngs), mesh)
            t0 = time.time()
            out = engine.eval_metrics_batch(vars_b, vars_t, episodes, rngs)
            out = to_host(out)  # forces completion; allgathers on >1 process
            t_run += time.time() - t0
            seen += valid_n

            # foreground channel only; background never enters the score
            accumulate_fg_iou(cls_inter, cls_union, out, limit=valid_n)
            accumulate_fg_iou(cls_inter0, cls_union0, out, suffix="0",
                              limit=valid_n)
            loss_meter.update(float(out["loss"][:valid_n].mean()), n=valid_n)

            if seen % max(e_batch, 200 // e_batch * e_batch) == 0:
                iou = {c: cls_inter[c] / (cls_union[c] + 1e-10) for c in cls_union}
                iou0 = {c: cls_inter0[c] / (cls_union0[c] + 1e-10) for c in cls_union0}
                log(
                    f"Test: [{seen}/{test_num}] "
                    f"mIoU {np.mean(list(iou.values())):.4f} "
                    f"mIoU0 {np.mean(list(iou0.values())):.4f} "
                    f"Loss {loss_meter.val:.4f} ({loss_meter.avg:.4f})"
                )

        iou = {c: cls_inter[c] / (cls_union[c] + 1e-10) for c in cls_union}
        miou = float(np.mean(list(iou.values()))) if iou else 0.0
        log(f"mIoU---Val result: mIoU {miou:.4f}.")
        for c in sorted(cls_union):
            log(f"Class {c} : {iou[c]:.4f}")
        run_mious[run] = miou
        run_losses[run] = loss_meter.avg
        runtimes[run] = t_run

    if profile_dir:
        from jax import profiler as _profiler

        _profiler.stop_trace()
        log(f"profiler trace written to {profile_dir}")

    log(f"Average mIoU over {cfg.n_runs} runs --- {run_mious.mean():.4f}.")
    log(f"Average runtime / run --- {runtimes.mean():.4f}.")
    return float(run_mious.mean()), float(run_losses.mean())


def episodic_validate(
    cfg, engine, vars_b, loader: EpisodeLoader, mesh=None, log=print
) -> Tuple[float, float]:
    """No-transformer episodic eval (raw adapted classifier; pretrain QA).

    Matches src/test.py:257-371: identical protocol but the prediction is the
    inner-loop classifier's own query logits. Runs the CWT-free engine program
    (the reference analog has no transformer either), so no transformer
    compute is wasted on the hottest validation loop.
    """
    test_num = cfg.test_num
    e_local = loader.batch_size
    e_batch = e_local * jax.process_count()
    batch_sizes = exact_batch_sizes(test_num, e_batch)
    base_key = jax.random.PRNGKey(cfg.manual_seed if cfg.manual_seed is not None else 0)

    run_mious = np.zeros(cfg.n_runs)
    run_losses = np.zeros(cfg.n_runs)
    for run in range(cfg.n_runs):
        cls_inter: Dict[int, float] = defaultdict(float)
        cls_union: Dict[int, float] = defaultdict(float)
        loss_meter = AverageMeter()
        stream = infinite(loader)
        for b, valid_n in enumerate(batch_sizes):
            batch = next(stream)
            episodes = _episode_fields(batch)
            if mesh is not None:
                episodes = shard_batch(episodes, mesh)
            rngs = jax.random.split(
                jax.random.fold_in(
                    base_key, (run * 1_000_003 + b) * 65_537 + jax.process_index()
                ),
                e_local,
            )
            if mesh is not None:
                rngs = shard_batch(np.asarray(rngs), mesh)
            out = to_host(engine.eval_metrics_batch_no_cwt(vars_b, episodes, rngs))
            accumulate_fg_iou(cls_inter, cls_union, out, suffix="0",
                              limit=valid_n)
            # score the raw adapted classifier: its own CE, not the dummy CWT's
            loss_meter.update(float(out["loss0"][:valid_n].mean()), n=valid_n)
        run_mious[run] = fg_miou(cls_inter, cls_union)
        run_losses[run] = loss_meter.avg
        log(f"episodic_validate run {run}: mIoU {run_mious[run]:.4f}")
    return float(run_mious.mean()), float(run_losses.mean())
