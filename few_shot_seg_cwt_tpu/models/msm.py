"""Multi-scale & neighbourhood feature enhancement blocks (flax).

Parity targets (reference: src/model/msm/msm_func.py): ``MSBlock`` (multi-
dilation conv sum, src:12-47) and ``WeightAverage`` (3x3-neighbourhood cosine
attention, src:50-104). The reference gathers neighbourhoods with F.unfold;
here the 1x1 projections commute with spatial shifts, so the nine neighbour
views are replicate-padded shifts of the projected maps — no unfold, no
materialized (B, C*9, HW) tensor.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_default_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class MSBlock(nn.Module):
    c_out: int = 32
    rate: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.normal(stddev=0.01)

        def conv(ch, dilation, name):
            return nn.Conv(
                ch, (3, 3), kernel_dilation=(dilation, dilation),
                padding=((dilation, dilation), (dilation, dilation)),
                kernel_init=init, bias_init=nn.initializers.zeros, name=name,
            )

        r = max(self.rate, 1)
        o = nn.relu(conv(self.c_out, 1, "conv")(x))
        o1 = nn.relu(conv(self.c_out, r * 1, "conv1")(o))
        o2 = nn.relu(conv(self.c_out, r * 2, "conv2")(o))
        o3 = nn.relu(conv(self.c_out, r * 3, "conv3")(o))
        return o + o1 + o2 + o3


def _neighbor_shifts(x: jnp.ndarray, r: int = 3):
    """Replicate-padded shifted views: list of (B, h, w, C), row-major r*r."""
    pad = r // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    h, w = x.shape[1], x.shape[2]
    views = []
    for di in range(r):
        for dj in range(r):
            views.append(xp[:, di : di + h, dj : dj + w, :])
    return views


class WeightAverage(nn.Module):
    """Local cosine-attention smoothing with residual."""

    r: int = 3
    att_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        c_out = c // 2
        conv = lambda name: nn.Conv(c_out, (1, 1), kernel_init=_default_kernel_init,
                                    name=name)
        theta = conv("conv_theta")(x)          # queries (center pixel)
        phi = conv("conv_phi")(x)              # keys (shifted below)
        g = conv("conv_g")(x)                  # values (shifted below)

        phis = jnp.stack(_neighbor_shifts(phi, self.r), axis=3)  # (B,h,w,K,c')
        gs = jnp.stack(_neighbor_shifts(g, self.r), axis=3)

        # cosine similarity with torch eps=1e-8 denominator clamp
        dot = jnp.einsum("bhwkc,bhwc->bhwk", phis, theta)
        denom = jnp.maximum(
            jnp.linalg.norm(phis, axis=-1) * jnp.linalg.norm(theta, axis=-1)[..., None],
            1e-8,
        )
        sim = dot / denom
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(rate=self.att_drop)(attn, deterministic=deterministic)

        avg = jnp.einsum("bhwk,bhwkc->bhwc", attn, gs)
        res = nn.Conv(c, (1, 1), kernel_init=_default_kernel_init, name="conv_back")(avg)
        res = nn.Dropout(rate=self.proj_drop)(res, deterministic=deterministic)
        return x + res
