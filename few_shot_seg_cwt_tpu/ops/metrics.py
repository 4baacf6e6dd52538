"""IoU metrics with the reference's exact counting rules, as on-device reductions.

Parity targets: ``intersectionAndUnionGPU`` (reference: src/util.py:280-308,
histc-based with ``preds[target==255] = 255``) and
``batch_intersectionAndUnionGPU`` (src/util.py:237-277, which bilinearly
upsamples logits to label resolution with align_corners=True *before* argmax).

The histc trick becomes masked one-hot sums — fully vectorized, jit-safe,
vmappable over episode batches, and psum-able across a device mesh.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .resize import upsample_bilinear_ac


def intersection_and_union(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    ignore_index: int = 255,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class (intersection, union, target) pixel areas.

    preds/target: same-shape integer arrays. Pixels whose target is
    ignore_index are removed from predictions and targets alike
    (the reference sets preds[target==255]=255 so they fall outside histc bins).
    """
    preds = preds.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_index
    if num_classes <= 8:
        # small-K fast path: K full-lane (N,) passes instead of an (N, K)
        # broadcast whose lane dimension is K (127/128 lanes idle at K=2)
        inters, outs, tgts = [], [], []
        for c in range(num_classes):
            p = (preds == c) & valid
            t = (target == c) & valid
            inters.append(jnp.sum(p & t))
            outs.append(jnp.sum(p))
            tgts.append(jnp.sum(t))
        area_inter = jnp.stack(inters).astype(jnp.float32)
        area_out = jnp.stack(outs).astype(jnp.float32)
        area_tgt = jnp.stack(tgts).astype(jnp.float32)
    else:
        cls = jnp.arange(num_classes, dtype=preds.dtype)
        pred_hit = (preds[:, None] == cls[None, :]) & valid[:, None]
        tgt_hit = (target[:, None] == cls[None, :]) & valid[:, None]
        area_inter = jnp.sum(pred_hit & tgt_hit, axis=0).astype(jnp.float32)
        area_out = jnp.sum(pred_hit, axis=0).astype(jnp.float32)
        area_tgt = jnp.sum(tgt_hit, axis=0).astype(jnp.float32)
    return area_inter, area_out + area_tgt - area_inter, area_tgt


def batch_intersection_and_union(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    ignore_index: int = 255,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Upsample logits to label resolution, argmax, then per-task/shot areas.

    logits: (n_task, shot, h, w, num_classes) NHWC;
    target: (n_task, shot, H, W).
    Returns three (n_task, shot, num_classes) arrays.
    """
    n_task, shot, h, w, c = logits.shape
    big_h, big_w = target.shape[-2:]
    x = logits.reshape(n_task * shot, h, w, c)
    x = upsample_bilinear_ac(x.astype(jnp.float32), (big_h, big_w))
    preds = jnp.argmax(x, axis=-1).reshape(n_task, shot, big_h, big_w)

    fn = jax.vmap(
        jax.vmap(
            lambda p, t: intersection_and_union(p, t, num_classes, ignore_index)
        )
    )
    return fn(preds, target)
