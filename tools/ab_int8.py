"""int8-consensus accuracy A/B: identical weights + episodes, quantized vs not.

The int8 consensus modes (ops/quant.py, ``FSS_NCONS_INT8=fake|dot``) are
accuracy-gated: before 'dot' can be a default, the quantization noise must be
priced against the prediction the protocol scores. This harness runs the SAME
head weights and the SAME synthetic episode stream through a baseline engine
and a quantized engine and reports

  * binary FG mIoU of both engines' label-free serving masks vs the episode
    labels (the mIoU proxy available without real data),
  * the delta in points,
  * the argmax flip rate between the two masks (473px resolution).

Mirrors the staged bf16 methodology (eval/ab_dtype.py, BENCH.md round 3);
rerun with real weights via the parity drill the day assets land.

Usage::

    python -m tools.ab_int8 [--mode fake|dot] [--head mmn] [--episodes 8]
        [--batch 4] [--image-size 473] [--shot 1] [--use-amp]

Prints one JSON line. The FSS_NCONS_INT8 env var is managed internally (set
before each engine's first trace; the flag is captured at trace time).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fake", choices=["fake", "dot"])
    ap.add_argument("--head", default="mmn")
    ap.add_argument("--episodes", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=473)
    ap.add_argument("--shot", type=int, default=1)
    ap.add_argument("--use-amp", action="store_true")
    ap.add_argument("--replay", default=None,
                    help="episode-log jsonl (data/replay.py): run the A/B on "
                         "a recorded real-image stream instead of synthetic "
                         "episodes — the decision-grade comparison")
    ap.add_argument("--pth", default=None,
                    help="stage-1 PSPNet .pth: import real backbone weights")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (the JAX_PLATFORMS env var "
                         "cannot override the axon sitecustomize hook) — "
                         "lets the accuracy A/B run off-chip while the chip "
                         "is busy with timing sweeps")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from few_shot_seg_cwt_tpu.config import default_cfg
    from few_shot_seg_cwt_tpu.data.synthetic import make_episode_batch
    from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
    from few_shot_seg_cwt_tpu.train.common import init_backbone
    from few_shot_seg_cwt_tpu.train.train_head import init_head_trainables

    cfg = default_cfg()
    cfg.image_size = args.image_size
    cfg.shot = args.shot
    cfg.use_amp = args.use_amp
    for k, v in dict(conv4d="red", temp=20.0, att_wt=0.2, rmid="l34",
                     wa=True, proj_drop=0.5, att_drop=0.5).items():
        cfg[k] = v

    os.environ.pop("FSS_NCONS_INT8", None)
    engine_a = HeadEngine(cfg, args.head)
    vars_b = init_backbone(cfg, engine_a)
    if args.pth:
        from few_shot_seg_cwt_tpu.train.common import _overlay
        from few_shot_seg_cwt_tpu.utils.ckpt import (import_pspnet,
                                                     load_torch_checkpoint)

        vars_b = _overlay(vars_b, import_pspnet(
            load_torch_checkpoint(args.pth), arch=cfg.arch,
            skip_classifier=True))
    trainables = init_head_trainables(cfg, engine_a, vars_b)

    replay_batches = None
    if args.replay:
        from few_shot_seg_cwt_tpu.data.loader import EpisodeLoader
        from few_shot_seg_cwt_tpu.data.replay import ReplayEpisodicDataset

        ds = ReplayEpisodicDataset(cfg, args.replay)
        args.batch = min(args.batch, len(ds))
        args.episodes = min(args.episodes, len(ds))
        loader = EpisodeLoader(ds, batch_size=args.batch, shuffle=False,
                               num_workers=0, drop_last=True)
        replay_batches = list(loader)

    def serve_fn(engine):
        def f(trainables, vars_b, batch, rngs):
            return jax.lax.map(
                lambda er: engine.serve_episode(vars_b, trainables,
                                                er[0], er[1]),
                (batch, rngs))
        return jax.jit(f)

    def run(engine, fn):
        masks, labels = [], []
        e = args.batch
        for bi, i in enumerate(range(0, args.episodes, e)):
            if replay_batches is not None:
                host = replay_batches[bi % len(replay_batches)]
            else:
                host = make_episode_batch(seed=100 + i, e=e,
                                          size=args.image_size, shot=args.shot)
            batch = {k: jnp.asarray(host[k])
                     for k in ("s_img", "s_label", "q_img", "q_label", "cls")}
            rngs = jax.random.split(jax.random.PRNGKey(7 + i), e)
            masks.append(np.asarray(fn(trainables, vars_b, batch, rngs)))
            labels.append(np.asarray(host["q_label"]))
        return np.concatenate(masks), np.concatenate(labels)

    def fg_iou(masks, labels):
        # binary FG IoU per episode, averaged (ignore 255)
        ious = []
        for m, t in zip(masks, labels):
            valid = t != 255
            inter = ((m == 1) & (t == 1) & valid).sum()
            union = (((m == 1) | (t == 1)) & valid).sum()
            ious.append(inter / max(union, 1))
        return float(np.mean(ious))

    # baseline engine traces with the flag OFF
    fn_a = serve_fn(engine_a)
    masks_a, labels = run(engine_a, fn_a)

    # quantized engine: a fresh instance traces with the flag ON
    os.environ["FSS_NCONS_INT8"] = args.mode
    engine_b = HeadEngine(cfg, args.head)
    fn_b = serve_fn(engine_b)
    masks_b, _ = run(engine_b, fn_b)
    os.environ.pop("FSS_NCONS_INT8", None)

    miou_a = fg_iou(masks_a, labels)
    miou_b = fg_iou(masks_b, labels)
    out = {
        "mode": args.mode,
        "head": args.head,
        "episodes": int(args.episodes),
        "image_size": int(args.image_size),
        "use_amp": bool(args.use_amp),
        "miou_base": round(miou_a, 4),
        "miou_int8": round(miou_b, 4),
        "delta_pts": round((miou_b - miou_a) * 100, 2),
        "argmax_flip_rate": round(float((masks_a != masks_b).mean()), 5),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
