"""Evaluation entry point (mIoU over n_runs x test_num episodes).

CLI-compatible re-design of the reference eval (reference: src/test.py):

    python -m few_shot_seg_cwt_tpu.train.test --config configs/pascal.yaml \
        --opts shot 1 cls_lr 0.1 test_num 1000 n_runs 5

Backbone weights load from ``resume_weights`` (torch .pth importer);
transformer weights from ``<model_dir schema>/<ckpt_used>.ckpt`` (orbax) or a
reference ``.pth`` via the importer. Without any checkpoint it evaluates a
random-init transformer (plumbing mode), like the reference's
"Not loading anything" branch (src/test.py:91).

Parity runs: ``--opts replay <episodes.jsonl>`` evaluates a recorded
reference episode stream (tools/record_episodes) instead of sampling — both
frameworks then score the byte-identical episode composition. Single-process;
episode_batch must divide test_num so run boundaries match the log.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..config import parse_args
from ..episodic.engine import EpisodicEngine
from ..eval.validate import validate_transformer
from ..utils.ckpt import import_cwt, load_ckpt, load_torch_checkpoint, import_pspnet
from .common import (
    apply_debug,
    episodic_val_loader,
    init_backbone,
    init_cwt,
    maybe_mesh,
    set_seeds,
    trans_ckpt_dir,
)


def load_transformer(cfg, engine, vars_t_init):
    root = trans_ckpt_dir(cfg)
    if cfg.ckpt_used is None:
        print("=> Not loading anything")
        return vars_t_init
    for ext, loader in ((".ckpt", "orbax"), (".pth", "torch")):
        path = os.path.join(root, f"{cfg.ckpt_used}{ext}")
        if os.path.exists(path):
            print(f"=> loading transformer weight '{path}'")
            if loader == "orbax":
                return load_ckpt(path, like=jax.tree.map(np.asarray, vars_t_init))
            return import_cwt(load_torch_checkpoint(path))
    print(f"=> no transformer ckpt under '{root}', evaluating random init")
    return vars_t_init


def load_backbone_weights(cfg, engine):
    """Backbone variables for evaluation/serving.

    test-time ``resume_weights`` may point directly at a .pth file
    (scripts/test.sh); otherwise the stage-1 directory schema applies.
    """
    if cfg.resume_weights and os.path.isfile(str(cfg.resume_weights)):
        vars_b = init_backbone(
            type(cfg)({**cfg, "resume_weights": None}), engine
        )
        sd = load_torch_checkpoint(cfg.resume_weights)
        from .common import _overlay

        vars_b = _overlay(
            vars_b, import_pspnet(sd, arch=cfg.arch, skip_classifier=True)
        )
        print(f"=> loaded weight '{cfg.resume_weights}'")
    else:
        vars_b = init_backbone(cfg, engine)
    return vars_b


def load_eval_weights(cfg, engine):
    """Backbone + transformer variables for evaluation/serving.

    The transformer loads via ``ckpt_used`` (orbax or reference .pth) with a
    random-init fallback (src/test.py:54-91).
    """
    vars_b = load_backbone_weights(cfg, engine)
    vars_t = load_transformer(cfg, engine, init_cwt(cfg, engine))
    return vars_b, vars_t


def main(cfg) -> float:
    from ..parallel.mesh import distributed_init

    distributed_init(cfg)  # MUST precede any jax call on multi-host runs
    set_seeds(cfg)
    apply_debug(cfg)

    engine = EpisodicEngine(cfg)
    mesh = maybe_mesh(cfg)
    vars_b, vars_t = load_eval_weights(cfg, engine)

    val_loader = episodic_val_loader(cfg)
    miou, loss = validate_transformer(cfg, engine, vars_b, vars_t, val_loader, mesh=mesh)
    return miou


if __name__ == "__main__":
    main(parse_args("Testing (TPU)"))
