"""Episode-level mask/label utilities (the reference's model_util toolbox).

Parity targets (reference: src/model/model_util.py):

* ``get_ig_mask`` (src:178-221): support-pixel ignore mask from quantile-
  thresholded query-FG/BG similarity statistics crossed with support
  predictions — rebuilt with masked means and masked quantiles (sort-based),
  fully on-device;
* ``att_weighted_out`` (src:224-236) / ``outer_forward``
  (src/model/pspnet.py:224-256): transductive attention readout blended by
  the learnable gamma;
* ``reset_cls_wt`` / ``reset_spt_label`` / ``compress_pred`` / ``pred2bmask``
  (src:112-175) for the incremental (CCA) trainers; the episode-adaptive
  ``adapt_reset_spt_label`` (src:130-155) is host-side numpy because its
  class count is data-dependent.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .corr import get_corr, l2norm
from .resize import resize_nearest


def masked_quantile(values: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """torch.quantile(values[mask], q) with linear interpolation; flat inputs."""
    big = jnp.finfo(jnp.float32).max
    v = jnp.where(mask, values.astype(jnp.float32), big)
    v = jnp.sort(v)
    n = jnp.sum(mask).astype(jnp.float32)
    pos = q * (n - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    v_lo = v[jnp.clip(lo, 0, v.shape[0] - 1)]
    v_hi = v[jnp.clip(hi, 0, v.shape[0] - 1)]
    return v_lo + frac * (v_hi - v_lo)


def get_ig_mask(
    sim: jnp.ndarray,       # (B, N_q, N_s) correlation
    s_label: jnp.ndarray,   # (B, H, W) support labels {0,1,255}
    q_label: jnp.ndarray,   # (B, H, W) query labels (255 = ignore)
    pd_q0: jnp.ndarray,     # (B, h, w, 2) raw query logits
    pd_s: jnp.ndarray,      # (B, h, w, 2) support-side logits
) -> jnp.ndarray:
    """(B, N_s) bool — support pixels to ignore in transductive attention."""
    b, _, n_s = sim.shape
    h, w = pd_q0.shape[1:3]

    s_small = resize_nearest(s_label[..., None].astype(jnp.float32), (h, w))[..., 0]
    s_mask = (s_small > 1).reshape(b, -1)                     # ignored support px

    pd_q_mask0 = jnp.argmax(pd_q0, axis=-1).reshape(b, -1)    # (B, N_q)
    q_small = resize_nearest(q_label[..., None].astype(jnp.float32), (h, w))[..., 0]
    q_valid = (q_small != 255.0).reshape(b, -1)
    qf_rows = q_valid & (pd_q_mask0 == 1)                     # predicted FG rows
    qb_rows = q_valid & (pd_q_mask0 == 0)

    def stats(rows):
        n_rows = jnp.sum(rows, axis=1, keepdims=True).astype(jnp.float32)
        mean = jnp.sum(
            sim * rows[..., None].astype(sim.dtype), axis=1
        ) / jnp.maximum(n_rows, 1.0)                          # (B, N_s)
        # quantile over all entries of the selected rows (per batch element)
        row_mask = jnp.broadcast_to(rows[..., None], sim.shape).reshape(b, -1)
        th = jax.vmap(masked_quantile, in_axes=(0, 0, None))(
            sim.reshape(b, -1), row_mask, 0.8
        )
        return mean, th, (n_rows[:, 0] > 0)

    qf_mean, th_qf, has_qf = stats(qf_rows)
    qb_mean, th_qb, has_qb = stats(qb_rows)

    sf_mask = jnp.argmax(pd_s, axis=-1).reshape(b, -1)        # (B, N_s)
    ig1 = (qf_mean > th_qf[:, None]) & (sf_mask == 0) & has_qf[:, None]
    ig3 = (qb_mean > th_qb[:, None]) & (sf_mask == 1) & has_qb[:, None]
    ig2 = (
        (qf_mean > th_qf[:, None]) & (qb_mean > th_qb[:, None])
        & has_qf[:, None] & has_qb[:, None]
    )
    return ig1 | ig2 | ig3 | s_mask


def att_weighted_out(
    sim: jnp.ndarray,        # (B, N_q, N_s)
    v: jnp.ndarray,          # (B, h, w, C) support values
    temp: float = 20.0,
    ig_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """softmax(sim*temp) readout -> (B, h, w, C); ignored entries set to 1e-5.

    The 1e-5 ignore fill is reference-exact for THIS function
    (model_util.py:231); MatchNet's readout uses 1e-4 (match.py) — the two
    constants intentionally differ, matching the reference's two sites.
    """
    b, h, w, c = v.shape
    if ig_mask is not None:
        sim = jnp.where(ig_mask[:, None, :], 1e-5, sim)
    attn = jax.nn.softmax(sim * temp, axis=-1)
    out = jnp.einsum("bqs,bsc->bqc", attn, v.reshape(b, -1, c),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h, w, c)


def outer_forward(
    f_q: jnp.ndarray,        # (B, h, w, C) bottleneck query features
    f_s: jnp.ndarray,        # (B, h, w, C) bottleneck support features
    fq_fea: jnp.ndarray,     # (B, h, w, C2) hi-level query features
    fs_fea: jnp.ndarray,     # (B, h, w, C2) hi-level support features
    s_label: jnp.ndarray,
    q_label: jnp.ndarray,
    pd_q0: jnp.ndarray,
    pd_s: jnp.ndarray,
    gamma: jnp.ndarray,
    temp: float = 20.0,
    dist: str = "dot",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Transductive attention blend (reference: src/model/pspnet.py:224-256).

    Returns (blended feature, corr, ig_mask); the caller classifies.
    """
    b, h, w, c = f_q.shape
    sim = get_corr(fq_fea, fs_fea)
    corr = sim.reshape(b, h, w, h, w)
    ig_mask = get_ig_mask(sim, s_label, q_label, pd_q0, pd_s)
    sim = jnp.where(ig_mask[:, None, :], 1e-5, sim)

    proj_v = f_s
    if dist == "cos":
        proj_v = l2norm(proj_v, axis=-1)
        f_q = l2norm(f_q, axis=-1)
    attn = jax.nn.softmax(sim * temp, axis=-1)
    weighted_v = jnp.einsum(
        "bqs,bsc->bqc", attn, proj_v.reshape(b, -1, c)
    ).reshape(b, h, w, c)
    out = (weighted_v * gamma + f_q) / (1.0 + gamma)
    return out, corr, ig_mask


# --------------------------------------------------------------------------- #
# incremental / multi-way helpers (CCA trainers)
# --------------------------------------------------------------------------- #

def reset_cls_wt(weights: jnp.ndarray, pre_cls_wt: jnp.ndarray,
                 num_classes_tr: int, idx_cls: int, rng: jax.Array) -> jnp.ndarray:
    """Re-seed a (K, C) classifier: base rows from pretraining, new row uniform."""
    k, c = weights.shape
    std = 1.0 / np.sqrt(c)
    new_row = jax.random.uniform(rng, (c,), weights.dtype, -std, std)
    out = weights.at[:num_classes_tr].set(pre_cls_wt[:num_classes_tr])
    return out.at[idx_cls].set(new_row)


def reset_spt_label(s_label: jnp.ndarray, pred: jnp.ndarray,
                    idx_cls: int) -> jnp.ndarray:
    """BG pixels -> base-class pseudo labels; FG -> idx_cls (src:119-127).

    pred: (B, H, W, K) base-classifier logits at label resolution.
    """
    pred = pred.at[..., idx_cls].set(-1000.0)
    pred_mask = jnp.argmax(pred, axis=-1).astype(s_label.dtype)
    out = jnp.where(s_label == 0, pred_mask, s_label)
    # sequential semantics: BG pixels pseudo-labeled 1 also become idx_cls
    return jnp.where(out == 1, idx_cls, out)


def adapt_reset_spt_label_np(
    s_label: np.ndarray, pred: np.ndarray, pre_cls_wt: np.ndarray,
    num_classes_tr: int, sub_cls: Optional[int] = None,
):
    """Episode-adaptive multi-way relabeling (host-side; src:130-155).

    Returns (new label, list of inherited base-class weight rows, num_cls).
    """
    # NOTE reference-exact wart: the relabeling below mutates s_label INSIDE
    # the frequency loop, so pixels relabeled to num_cls can be re-matched by
    # a later loop index i == num_cls and folded into background while their
    # inherited weight row stays in cls_init_wt. The reference does exactly
    # this (model_util.py:146-152); replicated for parity, not endorsed.
    s_label = s_label.copy()
    pred_mask = pred.argmax(-1)
    if sub_cls is not None and sub_cls > 0:
        pred_mask[pred_mask == sub_cls] = 0

    s_label[s_label == 1] = num_classes_tr      # park FG on a temp id
    bg = s_label == 0
    s_label[bg] = pred_mask[bg]

    num_cls = 2
    cls_init_wt = []
    freq = np.bincount(s_label.flatten())
    for i in range(1, min(len(freq), num_classes_tr)):
        if 0 < freq[i] <= 300 * len(s_label):
            s_label[s_label == i] = 0
        elif freq[i] > 300 * len(s_label) and 0 < i < num_classes_tr:
            s_label[s_label == i] = num_cls
            num_cls += 1
            cls_init_wt.append(pre_cls_wt[i])
    s_label[s_label == num_classes_tr] = 1
    return s_label, cls_init_wt, num_cls


def compress_pred(pred: jnp.ndarray, idx_cls: int,
                  input_type: str = "lg") -> jnp.ndarray:
    """Collapse a K-way prediction to binary (fg = idx_cls) probabilities."""
    if input_type in ("lg", "lt"):
        pred = jax.nn.softmax(pred, axis=-1)
    fg = pred[..., idx_cls]
    return jnp.stack([1.0 - fg, fg], axis=-1)


def pred2bmask(pred: jnp.ndarray, idx_cls: int = 1) -> jnp.ndarray:
    """argmax -> binary mask keeping only idx_cls as foreground."""
    m = jnp.argmax(pred, axis=-1)
    return (m == idx_cls).astype(jnp.int32)
