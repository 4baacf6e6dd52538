"""4D convolutions over correlation volumes, as batched NHWC 2D convs.

Two flavours, mirroring the reference (reference: src/model/conv4d.py):

* ``CenterPivotConv4d`` (HSNet-style, src:11-62): the 4D kernel is restricted
  to its two center-pivot planes, so the op is exactly two 2D convolutions —
  one over the query plane (h, w) batched across support positions, one over
  the support plane (h_s, w_s) batched across query positions — plus stride
  pruning. This maps 1:1 onto MXU conv units.
* ``Conv4d`` (true 4D, src:65-138): implemented as a sum of shifted 3D
  convolutions over one kernel axis (XLA lowers 3 spatial dims natively),
  replacing the reference's Python loop over the first spatial axis.

Volume layout is channels-last: (B, h, w, h_s, w_s, C).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch Conv2d default init for conv4d sub-convs
_default_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _uniform_bias_init(kernel_hw: int):
    def init(key, shape, dtype=jnp.float32):
        # torch Conv2d bias: U(+-1/sqrt(fan_in)); fan_in known at module level
        bound = 1.0 / jnp.sqrt(jnp.asarray(kernel_hw, jnp.float32))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class CenterPivotConv4d(nn.Module):
    """Center-pivot 4D conv: conv over (h,w) + conv over (hs,ws)."""

    out_channels: int
    kernel_size: Sequence[int] = (3, 3, 3, 3)
    stride: Sequence[int] = (1, 1, 1, 1)
    padding: Sequence[int] = (1, 1, 1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, hs, ws, c_in = x.shape
        k = self.kernel_size
        s = self.stride
        p = self.padding

        conv_q = nn.Conv(
            self.out_channels, (k[0], k[1]), strides=(s[0], s[1]),
            padding=((p[0], p[0]), (p[1], p[1])), use_bias=self.use_bias,
            kernel_init=_default_kernel_init, name="conv_query",
        )
        conv_s = nn.Conv(
            self.out_channels, (k[2], k[3]), strides=(s[2], s[3]),
            padding=((p[2], p[2]), (p[3], p[3])), use_bias=self.use_bias,
            kernel_init=_default_kernel_init, name="conv_support",
        )

        # branch 1: conv over the query plane; support grid pruned by stride
        x1 = x
        if s[2] > 1 or s[3] > 1:
            x1 = x1[:, :, :, :: s[2], :: s[3], :]
        hs1, ws1 = x1.shape[3], x1.shape[4]
        t = x1.transpose(0, 3, 4, 1, 2, 5).reshape(b * hs1 * ws1, h, w, c_in)
        t = conv_q(t)
        oh, ow, oc = t.shape[1], t.shape[2], t.shape[3]
        out1 = t.reshape(b, hs1, ws1, oh, ow, oc).transpose(0, 3, 4, 1, 2, 5)

        # branch 2: conv over the support plane, batched over query positions
        t2 = x.reshape(b * h * w, hs, ws, c_in)
        t2 = conv_s(t2)
        ohs, ows = t2.shape[1], t2.shape[2]
        out2 = t2.reshape(b, h, w, ohs, ows, oc)

        return out1 + out2


def conv4d(x: jnp.ndarray, kernel: jnp.ndarray,
           bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Full stride-1 4D convolution, decomposed into shifted 3D convs.

    x: (B, h, w, hs, ws, C_in); kernel: (k0, k1, k2, k3, C_in, C_out);
    padding k//2 on every spatial dim (size preserving). Matches the
    reference's looped-conv3d semantics (src/model/conv4d.py:65-106 and
    src/model/base/chm.py:12-37) without the Python-level output indexing.
    """
    b, h, w, hs, ws, c_in = x.shape
    k = kernel.shape[:4]
    c_out = kernel.shape[-1]

    pad0 = k[0] // 2
    xp = jnp.pad(x, ((0, 0), (pad0, pad0), (0, 0), (0, 0), (0, 0), (0, 0)))

    dn = jax.lax.conv_dimension_numbers(
        (b, w, hs, ws, c_in), (k[1], k[2], k[3], c_in, c_out),
        ("NHWDC", "HWDIO", "NHWDC"),
    )
    out = None
    for p in range(k[0]):  # kernel offset along the first query axis
        sl = xp[:, p : p + h, ...]                      # (b,h,w,hs,ws,ci)
        t = sl.reshape(b * h, w, hs, ws, c_in)
        o = jax.lax.conv_general_dilated(
            t, kernel[p], window_strides=(1, 1, 1),
            padding=[(k[1] // 2,) * 2, (k[2] // 2,) * 2, (k[3] // 2,) * 2],
            dimension_numbers=dn,
        )
        out = o if out is None else out + o
    out = out.reshape(b, h, w, hs, ws, c_out)
    if bias is not None:
        out = out + bias
    return out


class Conv4d(nn.Module):
    """Full 4D convolution module (stride 1)."""

    out_channels: int
    kernel_size: Sequence[int] = (3, 3, 3, 3)
    padding: Sequence[int] = (1, 1, 1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        k = self.kernel_size
        fan_in = c_in * k[0] * k[1] * k[2] * k[3]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k[0], k[1], k[2], k[3], c_in, self.out_channels),
        )
        bias = (
            self.param("bias", _uniform_bias_init(fan_in), (self.out_channels,))
            if self.use_bias else None
        )
        return conv4d(x, kernel, bias)
