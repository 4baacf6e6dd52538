"""Resize/pool primitives with exact PyTorch semantics, expressed as matmuls.

The reference leans on ``F.interpolate(..., mode='bilinear', align_corners=True)``
for every logit zoom (reference: src/model/pspnet.py:186, src/train.py:224-227)
and on ``nn.AdaptiveAvgPool2d`` for the PPM bins (src/model/pspnet.py:26).

On TPU both are best expressed as *separable dense matmuls* with precomputed
(static-shape) interpolation matrices: ``out = M_h @ x @ M_w^T`` per channel.
This keeps the whole episodic step inside the MXU, differentiates cleanly
(the VJP is just the transposed matmuls), and avoids gather-based resampling
which lowers poorly on TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def interp_matrix_align_corners(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, align_corners=True.

    Row i holds the weights of output sample i over input samples:
    src = i * (in-1)/(out-1); two taps floor/ceil with linear weights.
    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=True)`` applied separably.
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        m[:, 0] = 1.0
        return m.astype(np.float32)
    if out_size == 1:
        # align_corners=True maps the single output sample to input index 0
        m[0, 0] = 1.0
        return m.astype(np.float32)
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w_hi = src - lo
        m[i, lo] += 1.0 - w_hi
        m[i, hi] += w_hi
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def adaptive_pool_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix matching nn.AdaptiveAvgPool2d.

    Torch semantics: window i covers [floor(i*n/o), ceil((i+1)*n/o)).
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m.astype(np.float32)


def _sep_apply(x: jnp.ndarray, m_h: np.ndarray, m_w: np.ndarray) -> jnp.ndarray:
    """Apply separable row/col matrices to NHWC (or HWC / HW) input."""
    mh = jnp.asarray(m_h, dtype=x.dtype)
    mw = jnp.asarray(m_w, dtype=x.dtype)
    if x.ndim == 2:  # (H, W)
        return mh @ x @ mw.T
    if x.ndim == 3:  # (H, W, C)
        t = jnp.einsum("oh,hwc->owc", mh, x, preferred_element_type=x.dtype)
        return jnp.einsum("owc,pw->opc", t, mw, preferred_element_type=x.dtype)
    if x.ndim == 4:  # (N, H, W, C)
        t = jnp.einsum("oh,nhwc->nowc", mh, x, preferred_element_type=x.dtype)
        return jnp.einsum("nowc,pw->nopc", t, mw, preferred_element_type=x.dtype)
    raise ValueError(f"unsupported rank {x.ndim}")


def upsample_bilinear_ac(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear align_corners=True resize over the two spatial dims of NHWC."""
    h_in = x.shape[-3]
    w_in = x.shape[-2]
    out_h, out_w = out_hw
    if (h_in, w_in) == (out_h, out_w):
        return x
    return _sep_apply(
        x, interp_matrix_align_corners(out_h, h_in), interp_matrix_align_corners(out_w, w_in)
    )


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """nn.AdaptiveAvgPool2d over the two spatial dims of NHWC input."""
    h_in = x.shape[-3]
    w_in = x.shape[-2]
    out_h, out_w = out_hw
    return _sep_apply(x, adaptive_pool_matrix(out_h, h_in), adaptive_pool_matrix(out_w, w_in))


def resize_nearest(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize matching F.interpolate(mode='nearest'): src = floor(i*in/out).

    Works on (..., H, W) trailing-spatial layout or NHWC; here we take NHWC /
    (H, W) like the bilinear helper, using take along the spatial axes.
    """
    out_h, out_w = out_hw
    if x.ndim == 2:
        h_in, w_in = x.shape
        axis_h, axis_w = 0, 1
    else:
        h_in, w_in = x.shape[-3], x.shape[-2]
        axis_h, axis_w = x.ndim - 3, x.ndim - 2
    idx_h = np.floor(np.arange(out_h) * (h_in / out_h)).astype(np.int32)
    idx_w = np.floor(np.arange(out_w) * (w_in / out_w)).astype(np.int32)
    x = jnp.take(x, jnp.asarray(idx_h), axis=axis_h)
    x = jnp.take(x, jnp.asarray(idx_w), axis=axis_w)
    return x
