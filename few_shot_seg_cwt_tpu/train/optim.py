"""Optimizers & schedules with torch-equivalent semantics (optax).

Parity targets: SGD(momentum, weight_decay, nesterov) / Adam and the
step / multi_step / cosine schedules of the reference
(reference: src/optimizer.py:8-35). Torch's SGD adds weight decay to the
gradient *before* the momentum buffer, which is optax's
``add_decayed_weights -> sgd`` ordering; cosine is stepped per iteration
(src/pretrain.py:120-121, src/train_trans.py:175-176) with eta_min=1e-6.
"""

from __future__ import annotations

from typing import Optional

import optax


def build_lr_schedule(cfg, base_lr: float, iters_per_epoch: int):
    """Returns an optax schedule mapping the global step to a lr."""
    sched = cfg.get("scheduler", None)
    if sched is None or sched == "None":
        return base_lr
    if sched == "cosine":
        total = max(1, iters_per_epoch * cfg.epochs)
        return optax.cosine_decay_schedule(
            init_value=base_lr, decay_steps=total, alpha=1e-6 / max(base_lr, 1e-12)
        )
    if sched == "step":
        # epoch-level StepLR(gamma) every lr_stepsize epochs
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=cfg.lr_stepsize * iters_per_epoch,
            decay_rate=cfg.gamma,
            staircase=True,
        )
    if sched == "multi_step":
        boundaries = {
            int(m) * iters_per_epoch: cfg.gamma for m in cfg.milestones
        }
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    raise ValueError(f"unknown scheduler {sched}")


def build_optimizer(
    cfg, base_lr: float, iters_per_epoch: int = 1, use_schedule: bool = True
) -> optax.GradientTransformation:
    lr = build_lr_schedule(cfg, base_lr, iters_per_epoch) if use_schedule else base_lr
    if cfg.main_optim == "SGD":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(learning_rate=lr, momentum=cfg.momentum, nesterov=cfg.nesterov),
        )
    if cfg.main_optim == "Adam":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(learning_rate=lr),
        )
    raise ValueError(f"unknown optimizer {cfg.main_optim}")
