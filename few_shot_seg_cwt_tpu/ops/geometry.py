"""Keypoint-transfer geometry helpers (semantic-correspondence utilities).

Parity target: the reference's ``Geometry`` class
(reference: src/model/base/geometry.py:9-136) — keypoint normalization,
attentive indexing, argmax-centered Gaussian re-weighting of correlation rows,
and weighted-average keypoint transfer. No reference *trainer* calls these
(they come from the upstream CHM repo's PF-PASCAL evaluation); they are kept
for API completeness.

TPU re-design notes:
* the reference's per-sample Python loop over keypoints
  (geometry.py:90-101) becomes masked batch einsums — keypoint sets are
  padded to a static ``max_pts`` with a validity count ``n_pts`` (the
  reference pads predictions with -2 the same way, geometry.py:97);
* no class-level mutable state: ``spatial_side`` is an argument, grids are
  built inline (constant-folded under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PAD = -2.0  # reference sentinel for absent keypoints (geometry.py:29,97)


def normalize_kps(kps: jnp.ndarray, img_size: int) -> jnp.ndarray:
    """Map pixel coords into [-1, 1]; -2 sentinel entries pass through.

    Reference: geometry.py:26-31.
    """
    half = img_size // 2
    valid = kps != _PAD
    return jnp.where(valid, (kps - half) / half, kps)


def unnormalize_kps(kps: jnp.ndarray, img_size: int) -> jnp.ndarray:
    """Inverse of normalize_kps (reference: geometry.py:33-38)."""
    half = img_size // 2
    valid = kps != _PAD
    return jnp.where(valid, kps * half + half, kps)


def _norm_grid(spatial_side: int):
    """(side, side, 2) xy grid over [-1, 1] (reference: geometry.py:22-24)."""
    g = np.linspace(-1.0, 1.0, spatial_side, dtype=np.float32)
    gx, gy = np.meshgrid(g, g)  # gx varies along columns, gy along rows
    return jnp.asarray(np.stack([gx, gy], axis=-1))


def attentive_indexing(kps: jnp.ndarray, spatial_side: int,
                       thres: float = 0.1) -> jnp.ndarray:
    """Soft assignment of normalized keypoints to grid cells.

    kps: (N, 2) normalized xy. Returns (N, side, side) weights summing to 1
    per keypoint (reference: geometry.py:41-55).
    """
    grid = _norm_grid(spatial_side)                       # (s, s, 2)
    d2 = jnp.sum((grid[None] - kps[:, None, None, :]) ** 2, axis=-1)
    att = jnp.sqrt(d2 + 1e-5)
    att = jnp.clip(thres - att, 0.0, None).reshape(kps.shape[0], -1)
    att = att / (jnp.sum(att, axis=1, keepdims=True) + 1e-30)
    return att.reshape(kps.shape[0], spatial_side, spatial_side)


def apply_gaussian_kernel(corr: jnp.ndarray, spatial_side: int,
                          sigma: float = 17.0) -> jnp.ndarray:
    """Re-weight each correlation row by a Gaussian centered at its argmax.

    corr: (B, P, side*side). Reference: geometry.py:57-75 (there P = side²;
    any row count works here).
    """
    center = jnp.argmax(corr, axis=2)                      # (B, P)
    cy = (center // spatial_side).astype(jnp.float32)
    cx = (center % spatial_side).astype(jnp.float32)
    idx = jnp.arange(spatial_side, dtype=jnp.float32)
    dy = idx[None, None, :] - cy[..., None]                # (B, P, s)
    dx = idx[None, None, :] - cx[..., None]
    g = jnp.exp(-(dy[..., :, None] ** 2 + dx[..., None, :] ** 2)
                / (2.0 * sigma ** 2))                      # (B, P, s, s)
    b, p = corr.shape[:2]
    return (g.reshape(b, p, -1) * corr)


def transfer_kps(confidence: jnp.ndarray, src_kps: jnp.ndarray,
                 n_pts: jnp.ndarray, img_size: int,
                 normalized: bool = False) -> jnp.ndarray:
    """Transfer source keypoints through a correlation volume.

    confidence: (B, side², side²) source→target correlation;
    src_kps: (B, 2, max_pts) xy (pixel coords unless ``normalized``);
    n_pts: (B,) valid keypoint counts.
    Returns (B, 2, max_pts) normalized predicted keypoints, -2-padded.
    Reference: geometry.py:77-103.
    """
    spatial_side = img_size // 8
    if not normalized:
        src_kps = normalize_kps(src_kps, img_size)
    conf = apply_gaussian_kernel(confidence, spatial_side)
    pdf = jax.nn.softmax(conf, axis=2)                     # (B, P, s²)

    grid = _norm_grid(spatial_side).reshape(-1, 2)         # one grid convention
    prd_x = jnp.sum(pdf * grid[None, None, :, 0], axis=2)  # (B, P)
    prd_y = jnp.sum(pdf * grid[None, None, :, 1], axis=2)

    max_pts = src_kps.shape[-1]

    def per_sample(px, py, kp, n):
        prd_xy = jnp.stack([px, py], axis=-1)              # (P, 2)
        att = attentive_indexing(kp.T, spatial_side).reshape(max_pts, -1)
        prd = jnp.einsum("np,pc->nc", att, prd_xy)         # (max_pts, 2)
        valid = (jnp.arange(max_pts) < n)[:, None]
        return jnp.where(valid, prd, _PAD).T               # (2, max_pts)

    return jax.vmap(per_sample)(prd_x, prd_y, src_kps, n_pts)
