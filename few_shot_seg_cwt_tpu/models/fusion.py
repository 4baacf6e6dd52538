"""Dynamic fusion heads: predict per-pixel blend weights from correlations.

Parity targets (reference: src/model/transformer.py:252-374): ``DynamicFusion``
(4D-conv compressed correlation + pooled support mask -> sigmoid weight map),
``FuseNet1`` (two-layer 4D conv stack over a list of correlations + support
mask + prediction maps -> 2-channel softmax weights, used by train_fuse) and
``FuseNet`` (adds fg/bg correlation summaries, sigmoid output).
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conv4d import CenterPivotConv4d

_default_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """nn.AvgPool2d(kernel=2, stride=2) on NHWC."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _corr_to_channels(corr: jnp.ndarray, im_size: int) -> jnp.ndarray:
    """(B, h, w, s, s) compressed corr -> (B, h, w, s*s) channel stack."""
    b, h, w = corr.shape[:3]
    return corr.reshape(b, h, w, im_size * im_size)


class _Conv4dStack(nn.Module):
    """CenterPivot(1->16, support stride 2) -> ReLU -> CenterPivot(16->1) -> ReLU."""

    @nn.compact
    def __call__(self, corr: jnp.ndarray) -> jnp.ndarray:
        x = CenterPivotConv4d(16, (3,) * 4, stride=(1, 1, 2, 2), padding=(1,) * 4,
                              name="c0")(corr)
        x = nn.relu(x)
        x = CenterPivotConv4d(1, (3,) * 4, stride=(1, 1, 1, 1), padding=(1,) * 4,
                              name="c1")(x)
        return nn.relu(x)


class _MLPHead(nn.Module):
    out_ch: int
    mid_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.mid_dim, (1, 1), kernel_init=_default_kernel_init,
                    name="att0")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_ch, (1, 1), kernel_init=_default_kernel_init,
                       name="att1")(x)


class DynamicFusion(nn.Module):
    im_size: int = 30
    mid_dim: int = 256

    @nn.compact
    def __call__(self, corr: jnp.ndarray, s_mask: jnp.ndarray) -> jnp.ndarray:
        # corr: (B, h, w, hs, ws); s_mask: (B, H, W, 1)
        b, h, w = corr.shape[:3]
        x = CenterPivotConv4d(1, (3,) * 4, stride=(1, 1, 2, 2), padding=(1,) * 4,
                              name="conv4d")(corr[..., None])
        x = _corr_to_channels(x[..., 0], self.im_size)
        sm = avg_pool_2x2(s_mask).reshape(b, 1, 1, self.im_size * self.im_size)
        sm = jnp.broadcast_to(sm, (b, h, w, self.im_size * self.im_size))
        wt = _MLPHead(1, self.mid_dim, name="att")(jnp.concatenate([x, sm], -1))
        return jax.nn.sigmoid(wt)


class FuseNet1(nn.Module):
    im_size: int = 30
    mid_dim: int = 256

    @nn.compact
    def __call__(self, corr_lst: Sequence[jnp.ndarray], s_mask: jnp.ndarray,
                 pd_lst: Sequence[jnp.ndarray]) -> jnp.ndarray:
        # corr_lst: list of (B, h, w, hs, ws); s_mask (B, H, W, 1);
        # pd_lst: list of (B, h, w, C_pd) prediction maps
        b, h, w = corr_lst[0].shape[:3]
        stack = _Conv4dStack(name="conv4d")
        feats: List[jnp.ndarray] = []
        for corr in corr_lst:
            x = stack(corr[..., None])
            feats.append(_corr_to_channels(x[..., 0], self.im_size))
        if s_mask.shape[1] == 2 * self.im_size:
            s_mask = avg_pool_2x2(s_mask)
        sm = s_mask.reshape(b, 1, 1, self.im_size * self.im_size)
        feats.append(jnp.broadcast_to(sm, (b, h, w, self.im_size * self.im_size)))
        feats.extend(pd_lst)
        wt = _MLPHead(2, self.mid_dim, name="att")(jnp.concatenate(feats, -1))
        return jax.nn.softmax(wt, axis=-1)


class FuseNet(nn.Module):
    im_size: int = 30
    mid_dim: int = 256

    @nn.compact
    def __call__(self, corr: jnp.ndarray, pd_mask0: jnp.ndarray,
                 corr_fg: jnp.ndarray, corr_bg: jnp.ndarray,
                 s_mask: jnp.ndarray) -> jnp.ndarray:
        b, h, w = corr.shape[:3]
        x = _Conv4dStack(name="conv4d")(corr[..., None])
        feats = [_corr_to_channels(x[..., 0], self.im_size), pd_mask0]
        for m in (corr_fg, corr_bg, s_mask):
            mm = m.reshape(b, 1, 1, self.im_size * self.im_size)
            feats.append(jnp.broadcast_to(mm, (b, h, w, self.im_size * self.im_size)))
        wt = _MLPHead(1, self.mid_dim, name="att")(jnp.concatenate(feats, -1))
        return jax.nn.sigmoid(wt)
