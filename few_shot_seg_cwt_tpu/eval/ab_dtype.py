"""fp32 vs bf16 A/B: identical weights + episodes through both engines.

The bf16 backbone (``compute_dtype bfloat16`` / the reference's ``use_amp``
knob, reference: src/train_kshot.py:146-190) is opt-in until its accuracy cost
is measured against the mIoU protocol. This harness produces that evidence:
it runs the SAME weights and the SAME episode stream through an fp32 engine
and a bf16 engine and reports

  * protocol mIoU for both (per-class FG I/U accumulation, src/test.py:225-243)
  * the mIoU delta in points,
  * the argmax flip rate between the two predictions (feature resolution).

Weights default to random init through the normal init path; pass ``--pth``
(stage-1 PSPNet .pth) and ``--trans-pth`` (CWT .pth) to run the A/B on real
imported weights the day the released checkpoints are available — the command
line does not change.

Usage::

    python -m few_shot_seg_cwt_tpu.eval.ab_dtype [--episodes 128]
        [--batch 16] [--image-size 473] [--shot 1]
        [--pth stage1.pth] [--trans-pth best.pth]

Prints one JSON line with the measurements.
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def run_ab(cfg, n_episodes: int, e_batch: int,
           pth: Optional[str] = None, trans_pth: Optional[str] = None,
           stages: Optional[str] = None, log=print) -> Dict[str, float]:
    """A/B fp32 vs bf16. ``stages`` switches the B side from the whole-backbone
    bf16 cast to the mixed per-stage policy (cfg.bf16_stages), localizing the
    precision cost per stage."""
    import jax
    import jax.numpy as jnp

    from ..episodic.engine import EpisodicEngine
    from ..data.synthetic import make_episode_batch
    from ..train.common import _overlay, init_backbone, init_cwt
    from ..utils.ckpt import import_cwt, import_pspnet, load_torch_checkpoint
    from .validate import accumulate_fg_iou, fg_miou

    cfg32 = type(cfg)({**cfg, "compute_dtype": "float32", "use_amp": False,
                       "bf16_stages": None})
    engine32 = EpisodicEngine(cfg32)
    if stages:
        # mixed policy: the B backbone needs its own stage-cast module attrs;
        # the parameter tree structure is identical, so one tree drives both
        cfg_bf = type(cfg)({**cfg, "compute_dtype": "float32",
                            "use_amp": False, "bf16_stages": stages})
        engine_bf = EpisodicEngine(cfg_bf, cwt=engine32.cwt)
    else:
        cfg_bf = type(cfg)({**cfg, "compute_dtype": "bfloat16"})
        # share module objects so one variable tree drives both engines
        engine_bf = EpisodicEngine(cfg_bf, backbone=engine32.backbone,
                                   cwt=engine32.cwt)

    vars_b = init_backbone(
        type(cfg)({**cfg, "resume_weights": None}), engine32
    )
    if pth:
        sd = load_torch_checkpoint(pth)
        vars_b = _overlay(
            vars_b, import_pspnet(sd, arch=cfg.arch, skip_classifier=True)
        )
        log(f"=> A/B on imported stage-1 weights '{pth}'")
    vars_t = (
        import_cwt(load_torch_checkpoint(trans_pth)) if trans_pth
        else init_cwt(cfg, engine32)
    )
    if trans_pth:
        log(f"=> A/B on imported CWT weights '{trans_pth}'")

    # --replay: A/B on a recorded reference episode stream (real images)
    # instead of synthetic episodes — the decision-grade comparison
    replay_batches = None
    if cfg.get("replay"):
        from ..data.loader import EpisodeLoader
        from ..data.replay import ReplayEpisodicDataset

        ds = ReplayEpisodicDataset(cfg, str(cfg.replay))
        e_batch = min(e_batch, len(ds))  # logs smaller than one batch still run
        loader = EpisodeLoader(ds, batch_size=e_batch, shuffle=False,
                               num_workers=cfg.workers, drop_last=True)
        replay_batches = iter(loader)
        n_episodes = min(n_episodes, len(ds))

    n_batches = max(1, n_episodes // e_batch)
    base_key = jax.random.PRNGKey(cfg.manual_seed or 0)

    acc = {
        name: (defaultdict(float), defaultdict(float))
        for name in ("fp32", "bf16", "fp32_raw", "bf16_raw")
    }
    flips = 0
    pixels = 0
    for b in range(n_batches):
        if replay_batches is not None:
            host = next(replay_batches)
        else:
            host = make_episode_batch(
                seed=b + 1, e=e_batch, size=cfg.image_size, shot=cfg.shot
            )
        episodes = {
            k: jnp.asarray(host[k])
            for k in ("s_img", "s_label", "q_img", "q_label", "cls")
        }
        rngs = jax.random.split(jax.random.fold_in(base_key, b), e_batch)

        # one program per engine yields metrics AND the argmax maps
        m32 = jax.tree.map(np.asarray,
                           engine32.eval_metrics_batch_pred(vars_b, vars_t,
                                                            episodes, rngs))
        mbf = jax.tree.map(np.asarray,
                           engine_bf.eval_metrics_batch_pred(vars_b, vars_t,
                                                             episodes, rngs))
        accumulate_fg_iou(*acc["fp32"], m32)
        accumulate_fg_iou(*acc["bf16"], mbf)
        accumulate_fg_iou(*acc["fp32_raw"], m32, suffix="0")
        accumulate_fg_iou(*acc["bf16_raw"], mbf, suffix="0")

        flips += int((m32["pred_lab"] != mbf["pred_lab"]).sum())
        pixels += m32["pred_lab"].size
        log(f"A/B batch {b + 1}/{n_batches}: "
            f"mIoU fp32 {fg_miou(*acc['fp32']):.4f} "
            f"bf16 {fg_miou(*acc['bf16']):.4f}")

    miou32 = fg_miou(*acc["fp32"])
    mioubf = fg_miou(*acc["bf16"])
    return {
        "episodes": n_batches * e_batch,
        "miou_fp32": round(miou32, 4),
        "miou_bf16": round(mioubf, 4),
        "delta_pts": round((mioubf - miou32) * 100, 3),
        "miou_raw_fp32": round(fg_miou(*acc["fp32_raw"]), 4),
        "miou_raw_bf16": round(fg_miou(*acc["bf16_raw"]), 4),
        "argmax_flip_rate": round(flips / max(pixels, 1), 5),
        "weights": "imported .pth" if pth else "random init",
        "shot": cfg.shot,
        "image_size": cfg.image_size,
        "bf16_stages": stages or "all (whole-backbone cast)",
    }


def main(argv=None) -> Dict[str, float]:
    from ..config import default_cfg, load_cfg, merge_cfg_from_list

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None,
                    help="experiment yaml (data_root/split/arch...); "
                         "defaults to the built-in defaults table")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="config overrides: key value key value ...")
    ap.add_argument("--episodes", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=473)
    ap.add_argument("--shot", type=int, default=1)
    ap.add_argument("--pth", default=None, help="stage-1 PSPNet .pth")
    ap.add_argument("--trans-pth", default=None, help="CWT transformer .pth")
    ap.add_argument("--replay", default=None,
                    help="recorded episode log (tools/record_episodes): run "
                         "the A/B on real images instead of synthetic episodes")
    ap.add_argument("--stages", default=None,
                    help="comma list of backbone stages to run in bf16 "
                         "(mixed policy) instead of the whole-backbone cast")
    ap.add_argument("--sweep", action="store_true",
                    help="ablate each backbone stage individually (one A/B "
                         "per stage) and print one JSON line per stage")
    ns = ap.parse_args(argv)

    cfg = load_cfg(ns.config) if ns.config else default_cfg()
    if ns.opts:
        cfg = merge_cfg_from_list(cfg, ns.opts)
    cfg.image_size = ns.image_size
    cfg.shot = ns.shot
    cfg.pretrained = False
    cfg.replay = ns.replay

    err = lambda *a: print(*a, file=sys.stderr)
    if ns.sweep:
        from ..models.pspnet import BACKBONE_STAGES

        results = {}
        for stage in BACKBONE_STAGES:
            r = run_ab(cfg, ns.episodes, ns.batch, pth=ns.pth,
                       trans_pth=ns.trans_pth, stages=stage, log=err)
            results[stage] = r
            print(json.dumps(r))
        return results

    result = run_ab(cfg, ns.episodes, ns.batch,
                    pth=ns.pth, trans_pth=ns.trans_pth,
                    stages=ns.stages, log=err)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
