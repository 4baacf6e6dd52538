"""Multi-scale deformable attention + sine positional encoding (flax).

Parity targets: ``MSDeformAttn`` (reference:
src/model/ops/modules/ms_deform_attn.py:30-117) whose live compute path is the
pure-torch ``ms_deform_attn_core_pytorch`` built on F.grid_sample
(src/model/ops/functions/ms_deform_attn_func.py:40-61 — the CUDA extension is
commented out), and ``SinePositionalEncoding``
(src/model/positional_encoding.py:7-85).

The grid_sample becomes an explicit bilinear gather with zero padding and
align_corners=False unnormalization — a handful of static gathers + lerps
that XLA fuses; no scatter, no dynamic shapes.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def grid_sample_bilinear(value: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """F.grid_sample(mode=bilinear, padding=zeros, align_corners=False).

    value: (N, H, W, C); grid: (N, ..., 2) xy in [-1, 1].
    Returns (N, ..., C).
    """
    n, h, w, c = value.shape
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = value.reshape(n, h * w, c)
        idx = (yc * w + xc).reshape(n, -1)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        out = out.reshape(*yi.shape, c)
        return out * valid[..., None].astype(value.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def sine_positional_encoding(
    mask: jnp.ndarray,          # (B, h, w) nonzero = ignored
    num_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Returns (B, h, w, num_feats*2) position embedding (NHWC)."""
    not_mask = (mask == 0).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = np.arange(num_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=4)
    pos_x = pos_x.reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=4)
    pos_y = pos_y.reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class LearnedPositionalEncoding(nn.Module):
    """Learnable row/col position embeddings (NHWC).

    Parity target: reference src/model/positional_encoding.py:88-150 — two
    embedding tables (row, col) of ``num_feats`` each, uniform(0,1) init; the
    output concatenates [col_embed(x), row_embed(y)] per position to
    (B, h, w, num_feats*2). Unused by any reference trainer; kept for API
    completeness alongside the sine encoding.
    """

    num_feats: int
    row_num_embed: int = 50
    col_num_embed: int = 50

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        h, w = mask.shape[-2:]
        row = self.param(
            "row_embed", nn.initializers.uniform(scale=1.0),
            (self.row_num_embed, self.num_feats),
        )
        col = self.param(
            "col_embed", nn.initializers.uniform(scale=1.0),
            (self.col_num_embed, self.num_feats),
        )
        x_embed = col[:w]                                   # (w, F)
        y_embed = row[:h]                                   # (h, F)
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(x_embed[None, :, :], (h, w, self.num_feats)),
                jnp.broadcast_to(y_embed[:, None, :], (h, w, self.num_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos[None], (mask.shape[0], h, w, 2 * self.num_feats))


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reference grid init: per-head unit directions scaled by point index."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttn(nn.Module):
    d_model: int = 256
    n_levels: int = 1
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,              # (N, Lq, C)
        reference_points: jnp.ndarray,   # (N, Lq, n_levels, 2) in [0, 1]
        input_flatten: jnp.ndarray,      # (N, Lin, C)
        spatial_shapes: Sequence[Tuple[int, int]],  # static [(H, W), ...]
        input_padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        n, len_q, _ = query.shape
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m

        value = nn.Dense(self.d_model, kernel_init=nn.initializers.xavier_uniform(),
                         name="value_proj")(input_flatten)
        if input_padding_mask is not None:
            value = jnp.where(input_padding_mask[..., None], 0.0, value)
        value = value.reshape(n, -1, m, d)

        offsets = nn.Dense(
            m * l * p * 2, kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(m, l, p), name="sampling_offsets",
        )(query).reshape(n, len_q, m, l, p, 2)
        attn = nn.Dense(
            m * l * p, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="attention_weights",
        )(query).reshape(n, len_q, m, l * p)
        attn = jax.nn.softmax(attn, axis=-1).reshape(n, len_q, m, l, p)

        normalizer = jnp.asarray(
            [[wh[1], wh[0]] for wh in spatial_shapes], jnp.float32
        )  # (L, 2) as (W, H)
        loc = reference_points[:, :, None, :, None, :] + offsets / normalizer[None, None, None, :, None, :]

        # split the flattened value back into levels (static shapes)
        sizes = [h_ * w_ for h_, w_ in spatial_shapes]
        starts = np.cumsum([0] + sizes[:-1])
        out_per_level = []
        for lid, (h_, w_) in enumerate(spatial_shapes):
            v = value[:, starts[lid] : starts[lid] + sizes[lid]]          # (N, hw, M, D)
            v = v.transpose(0, 2, 1, 3).reshape(n * m, h_, w_, d)
            g = 2.0 * loc[:, :, :, lid] - 1.0                             # (N, Lq, M, P, 2)
            g = g.transpose(0, 2, 1, 3, 4).reshape(n * m, len_q, p, 2)
            sampled = grid_sample_bilinear(v, g)                          # (N*M, Lq, P, D)
            out_per_level.append(sampled)
        sampled = jnp.stack(out_per_level, axis=2)                        # (N*M, Lq, L, P, D)

        aw = attn.transpose(0, 2, 1, 3, 4).reshape(n * m, len_q, l * p)
        out = jnp.einsum(
            "qlkd,qlk->qld", sampled.reshape(n * m, len_q, l * p, d), aw
        )
        out = out.reshape(n, m, len_q, d).transpose(0, 2, 1, 3).reshape(n, len_q, m * d)
        return nn.Dense(self.d_model, kernel_init=nn.initializers.xavier_uniform(),
                        name="output_proj")(out)


class DeformAtt(nn.Module):
    """Self-attention branch of DeTr (reference: src/model/detr.py:78-151)."""

    embed_dims: int = 512
    n_heads: int = 8
    n_points: int = 9
    n_levels: int = 1

    @nn.compact
    def __call__(self, fq_fea: jnp.ndarray, f_q: jnp.ndarray,
                 padding_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # single-level: fq_fea (B, h, w, C) queries; f_q values
        b, h, w, c = fq_fea.shape
        level_embed = self.param(
            "level_embed", nn.initializers.uniform(scale=1.0),
            (self.n_levels, self.embed_dims),
        )
        del level_embed  # kept for ckpt parity; only used with >1 levels

        if padding_mask is None:
            mask = jnp.zeros((b, h, w), jnp.int32)
        else:
            mask = padding_mask
        pos = sine_positional_encoding(mask, self.embed_dims // 2, normalize=True)
        q_flat = fq_fea.reshape(b, h * w, c) + pos.reshape(b, h * w, self.embed_dims)

        ref_y, ref_x = np.meshgrid(
            (np.arange(h, dtype=np.float32) + 0.5) / h,
            (np.arange(w, dtype=np.float32) + 0.5) / w,
            indexing="ij",
        )
        ref = np.stack([ref_x.reshape(-1), ref_y.reshape(-1)], -1)  # (hw, 2)
        ref = jnp.asarray(ref)[None, :, None, :].repeat(b, 0)       # (B, hw, 1, 2)

        value_flat = f_q.reshape(b, h * w, -1)
        # input_padding_mask deliberately None: the padding_mask feeds ONLY
        # the positional encoding, exactly like the reference's
        # `input_padding_mask=None` at detr.py:94 — the value-zeroing path in
        # MSDeformAttn exists for API parity but the reference never uses it
        out = MSDeformAttn(
            d_model=self.embed_dims, n_levels=self.n_levels,
            n_heads=self.n_heads, n_points=self.n_points, name="self_trans",
        )(q_flat, ref, value_flat, [(h, w)], None)
        return out.reshape(b, h, w, self.embed_dims)
