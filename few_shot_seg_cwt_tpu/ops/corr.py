"""Correlation-volume primitives (cosine correlation, mutual matching).

Parity targets: ``get_corr`` (reference: src/model/model_util.py:101-109,
channel-L2-normalized cosine correlation), ``MutualMatching`` (Rocco-style
per-direction max normalization, src/model/match.py:21-53) and
``mutual_nn_filter`` (src/model/base/correlation.py:14-24).

Layout convention: flattened correlations are (B, N_q, N_s); 4D volumes are
channels-last (B, h, w, h_s, w_s, C) so the pivot convolutions batch cleanly
into NHWC 2D convs on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2norm(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize: x / max(||x||, eps) along ``axis``."""
    n = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=axis, keepdims=True))
    return (x / jnp.maximum(n, eps)).astype(x.dtype)


def get_corr(q_feat: jnp.ndarray, k_feat: jnp.ndarray) -> jnp.ndarray:
    """Cosine correlation of two NHWC feature maps -> (B, Nq, Nk).

    Accumulates f32 on the MXU always; under AMP (bf16 features) the volume
    is EMITTED bf16 — torch.cuda.amp autocasts the reference's bmm to half
    (src/model/model_util.py:101-109 under train_kshot's autocast), and the
    half-width volume halves the bandwidth of everything downstream
    (mutual matching, the consensus convs and their transposes — the
    bandwidth-bound bulk of the head step, BENCH.md round 4).
    """
    b, h, w, c = q_feat.shape
    q = l2norm(q_feat.reshape(b, h * w, c), axis=-1)
    k = l2norm(k_feat.reshape(b, -1, c), axis=-1)
    out = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    if q_feat.dtype == jnp.bfloat16:
        out = out.astype(jnp.bfloat16)
    return out


def mutual_matching(corr: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-channel mutual-max normalization of a 4D volume.

    corr: (B, h, w, hs, ws, C). Matches MutualMatching_chn applied per channel:
    corr * (corr/max_over_query * corr/max_over_support).
    """
    max_s = jnp.max(corr, axis=(3, 4), keepdims=True)   # max over support dims
    max_q = jnp.max(corr, axis=(1, 2), keepdims=True)   # max over query dims
    corr_a = corr / (max_s + eps)
    corr_b = corr / (max_q + eps)
    return corr * (corr_a * corr_b)


def mutual_matching_flat(corr: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """mutual_matching on the flat channels-major layout (B, C, Q, S).

    Q = h*w (query pixels), S = hs*ws (support pixels); identical math to
    the 6D form — per-channel max over all support pixels / all query pixels.
    """
    max_s = jnp.max(corr, axis=3, keepdims=True)
    max_q = jnp.max(corr, axis=2, keepdims=True)
    corr_a = corr / (max_s + eps)
    corr_b = corr / (max_q + eps)
    return corr * (corr_a * corr_b)


def mutual_matching_bqsc(corr: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """mutual_matching on the rank-4 channels-last layout (B, Q, S, C).

    Q = h*w (query pixels), S = hs*ws (support pixels); identical math to
    the 6D and channels-major forms — per-channel max over all support
    pixels / all query pixels. This is the layout of the rank-4 consensus
    route (models/matching.py ncons_r4_active).
    """
    max_s = jnp.max(corr, axis=2, keepdims=True)
    max_q = jnp.max(corr, axis=1, keepdims=True)
    corr_a = corr / (max_s + eps)
    corr_b = corr / (max_q + eps)
    return corr * (corr_a * corr_b)


def mutual_nn_filter(corr: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Mutual nearest-neighbour filtering of a flattened (B, N, N) matrix."""
    src_max = jnp.max(corr, axis=2, keepdims=True)
    trg_max = jnp.max(corr, axis=1, keepdims=True)
    src_max = jnp.where(src_max == 0, src_max + eps, src_max)
    trg_max = jnp.where(trg_max == 0, trg_max + eps, trg_max)
    return corr * ((corr / src_max) * (corr / trg_max))


def masked_attention_readout(
    corr2d: jnp.ndarray,     # (B, N_q, N_s)
    values: jnp.ndarray,     # (B, N_s, C) or NHWC support features
    temp: float = 20.0,
    ig_mask: jnp.ndarray | None = None,  # (B, N_s) bool, True = ignore
    ig_fill: float = 1e-4,
) -> jnp.ndarray:
    """softmax(corr*temp) @ values with ignored support pixels neutralized.

    Matches the reference's readout (src/model/model_util.py:224-236 and
    match.py:121-131): ignored entries are *overwritten with a small constant*
    (not -inf) before the softmax.
    """
    if values.ndim == 4:
        b, h, w, c = values.shape
        values = values.reshape(b, h * w, c)
    if ig_mask is not None:
        corr2d = jnp.where(ig_mask[:, None, :], ig_fill, corr2d)
    # softmax in f32 even when the volume is AMP-bf16: torch.cuda.amp lists
    # softmax as an fp32 op, and a 3600-way bf16 softmax loses real mass
    attn = jax.nn.softmax(corr2d.astype(jnp.float32) * temp, axis=-1)
    return jnp.einsum("bqs,bsc->bqc", attn, values.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
