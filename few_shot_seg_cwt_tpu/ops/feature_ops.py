"""Feature-space debug/visualization ops (reference: utils/operations.py).

* ``pca``: project (N, C) features to k components (used for feature-map
  visualization, reference utils/operations.py:35-54);
* ``generate_location_features``: normalized (x, y) coordinate grids
  (reference :60-81);
* ``normalized_conv_weights``: L2-normalize classifier weights per class
  (reference NormConv2d :7-13);
* ``get_binary_logits``: collapse K-way logits to (bg, fg) for one class.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def pca(features: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """(N, C) -> (N, k) principal-component projection (SVD-based)."""
    x = jnp.asarray(features, jnp.float32)
    x = x - jnp.mean(x, axis=0, keepdims=True)
    _, _, vt = jnp.linalg.svd(x, full_matrices=False)
    return x @ vt[:k].T


def generate_location_features(hw: Tuple[int, int]) -> np.ndarray:
    """(h, w) -> (h, w, 2) normalized (y, x) coordinates in [0, 1]."""
    h, w = hw
    ys = np.linspace(0.0, 1.0, h, dtype=np.float32)
    xs = np.linspace(0.0, 1.0, w, dtype=np.float32)
    grid_y, grid_x = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([grid_y, grid_x], axis=-1)


def normalized_conv_weights(weights: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize (C, K) classifier weights along the channel axis."""
    n = jnp.sqrt(jnp.sum(weights**2, axis=0, keepdims=True))
    return weights / jnp.maximum(n, eps)


def get_binary_logits(logits: jnp.ndarray, fg_idx: int) -> jnp.ndarray:
    """(…, K) -> (…, 2): background = max over non-fg classes, foreground = fg."""
    k = logits.shape[-1]
    mask = jnp.arange(k) == fg_idx
    bg = jnp.max(jnp.where(mask, -jnp.inf, logits), axis=-1)
    fg = logits[..., fg_idx]
    return jnp.stack([bg, fg], axis=-1)
