"""Segmentation losses with PyTorch-exact reductions, NHWC logits.

Parity targets in the reference:
* class-weighted CE with ignore_index=255 and weight-normalized mean
  (reference: src/train.py:215-217, src/model/model_util.py:27-37);
* weighted dice loss (src/model/model_util.py:40-73);
* label-smoothing CE for stage-1 pretraining (src/pretrain.py:182-219);
* the SegLoss dispatcher (src/model/model_util.py:9-24).

All functions take NHWC logits ``(..., H, W, C)`` and integer targets
``(..., H, W)`` with 255 as the ignore label, and are jit/vmap/grad-safe
(no host syncs; the per-episode "dynamic class weights" of the reference
become on-device reductions).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits, axis=-1)


def weighted_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: jnp.ndarray,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """nn.CrossEntropyLoss(weight=w, ignore_index=255) with mean reduction.

    PyTorch's weighted mean divides by the *sum of the per-pixel weights*
    of the counted pixels, not the pixel count.
    """
    num_classes = logits.shape[-1]
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0).astype(jnp.int32)
    logp = _log_softmax(logits.astype(jnp.float32))
    cw = class_weights.astype(jnp.float32)
    if num_classes == 2:
        # gather-free fast path: per-pixel gathers (take_along_axis and the
        # class_weights[tgt] indexed read) lower to slow TPU gathers at
        # 473^2 x batch scale; binary selects keep the VPU lanes full
        is_fg = tgt == 1
        nll = -jnp.where(is_fg, logp[..., 1], logp[..., 0])
        w = jnp.where(is_fg, cw[1], cw[0]) * valid.astype(jnp.float32)
    else:
        onehot = (tgt[..., None] == jnp.arange(num_classes)).astype(jnp.float32)
        nll = -jnp.sum(logp * onehot, axis=-1)
        w = jnp.sum(cw * onehot, axis=-1) * valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def binary_weighted_ce_from_diff(
    diff: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: jnp.ndarray,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """``weighted_cross_entropy`` for K=2 computed from the logit DIFFERENCE.

    For two classes the per-pixel CE depends only on d = l1 - l0:
    logsumexp(l0, l1) - l_y = softplus(d) - y*d (the l0 term cancels), so the
    whole loss runs on one (H, W) plane with full VPU lanes instead of an
    (H, W, 2) log_softmax whose lane dim is 2. Value and gradient are
    bitwise-equivalent math to the K=2 path of weighted_cross_entropy.
    """
    valid = target != ignore_index
    y = ((target == 1) & valid)
    d = diff.astype(jnp.float32)
    nll = jax.nn.softplus(d) - jnp.where(y, d, 0.0)
    cw = class_weights.astype(jnp.float32)
    w = jnp.where(y, cw[1], cw[0]) * valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def cross_entropy(
    logits: jnp.ndarray, target: jnp.ndarray, ignore_index: int = 255
) -> jnp.ndarray:
    """Unweighted nn.CrossEntropyLoss(ignore_index=255), mean over valid pixels."""
    num_classes = logits.shape[-1]
    return weighted_cross_entropy(
        logits, target, jnp.ones((num_classes,), jnp.float32), ignore_index
    )


def class_balance_weights(
    label: jnp.ndarray,
    num_classes: int = 2,
    fg_idx: int = 1,
    tp: float = 1.0,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Per-episode dynamic class weights [1, (n_bg/n_fg)**tp].

    bg counts EVERY valid non-fg pixel ("all pixels not belonging to current
    cls CONSIDERED as BG", reference model_util.py:30,92) — identical to the
    reference's label==0 count for binary labels (src/train.py:211-216) and
    reference-exact for the multi-way CCA labels. 255 excluded; runs
    on-device. ``tp`` generalizes to Adapt_SegLoss (model_util.py:88-97).
    """
    valid = label != ignore_index
    fg_cnt = jnp.sum((label == fg_idx) & valid).astype(jnp.float32)
    bg_cnt = jnp.sum(valid).astype(jnp.float32) - fg_cnt
    w = jnp.ones((num_classes,), jnp.float32)
    ratio = (bg_cnt / jnp.maximum(fg_cnt, 1e-12)) ** tp
    return w.at[fg_idx].set(ratio)


def weighted_dice_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    weighted_val: float = 1.0,
    reduction: str = "sum",
    input_type: str = "lg",
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Binary dice over sigmoid'ed per-class maps (src/model/model_util.py:40-73).

    logits: (B, H, W, 2); target: (B, H, W) in {0, 1, 255} (255 dropped from
    both one-hot planes, exactly like the reference's stacked == masks).
    """
    fg = (target == 1).astype(jnp.float32)
    bg = (target == 0).astype(jnp.float32)
    tgt = jnp.stack([bg, fg], axis=-1)  # (B, H, W, 2)
    pred = logits.astype(jnp.float32)
    if input_type in ("lg", "lt"):
        pred = jax.nn.sigmoid(pred)
    b = tgt.shape[0]
    pred = pred.reshape(b, -1, 2).transpose(0, 2, 1).reshape(b * 2, -1)
    tgt = tgt.reshape(b, -1, 2).transpose(0, 2, 1).reshape(b * 2, -1)
    denom = jnp.sum(pred**2, -1) + jnp.sum(tgt**2, -1)
    loss = 1.0 - 2.0 * jnp.sum(pred * tgt, -1) / jnp.maximum(denom, eps)
    loss = loss * weighted_val
    if reduction == "sum":
        return jnp.sum(loss) / b
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def smoothed_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    smoothing: float = 0.1,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Label-smoothing CE used by stage-1 pretraining (src/pretrain.py:196-218).

    true class -> (1 - eps); every other class -> eps / (num_classes - 1);
    ignored pixels (255) are scattered onto class 0 for the one-hot (like the
    reference) but masked out of the mean.
    """
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32)
    smoothed = onehot * (1.0 - smoothing) + (1.0 - onehot) * (
        smoothing / max(num_classes - 1, 1)
    )
    logp = _log_softmax(logits.astype(jnp.float32))
    loss_pix = -jnp.sum(smoothed * logp, axis=-1) * valid.astype(jnp.float32)
    return jnp.sum(loss_pix) / jnp.maximum(jnp.sum(valid), 1)


def seg_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    loss_type: str = "wt_ce",
    num_classes: int = 2,
    fg_idx: int = 1,
    input_type: str = "lg",
) -> jnp.ndarray:
    """SegLoss dispatcher (src/model/model_util.py:9-24)."""
    if loss_type in ("wt_dc", "dc"):
        return weighted_dice_loss(logits, target, input_type=input_type)
    if loss_type == "ce":
        return cross_entropy(logits, target)
    w = class_balance_weights(target, num_classes=num_classes, fg_idx=fg_idx)
    return weighted_cross_entropy(logits, target, w)
