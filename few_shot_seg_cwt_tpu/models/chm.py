"""Convolutional Hough matching (CHM) layers and the CHMLearner head.

Parity targets (reference: src/model/base/chm.py, chm_kernel.py and
src/model/match.py:191-244):

* ``KernelGenerator``-style weight sharing: 4D kernel entries are grouped by
  geometric keys ('iso': offset distance; 'psi': (d_max, d_min, d_off)); one
  learnable scalar per group, spread as w/len(group) over the kernel.
* ``CHM4d``: parameter-shared 4D convolution (fast4d == a standard stride-1
  4D conv — see models.conv4d.conv4d).
* ``CHM6d``: 4D convolution per scale-pair kernel + a *flipped* convolution
  over the 3x3 scale axes (the reference realizes the flip via diagonal sums
  plus a final reverse; here the scale kernel is applied with explicit
  flipped-offset shifts, verified equal against the reference).
* ``CHMLearner``: multi-scale conv embeddings -> 6D correlation -> CHM6d ->
  sigmoid -> scale max-pool -> 4D upsample -> CHM4d -> softplus -> mutual NN
  filter -> temperature softmax readout.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.corr import masked_attention_readout, mutual_nn_filter
from ..ops.resize import upsample_bilinear_ac
from .conv4d import conv4d


# --------------------------------------------------------------------------- #
# kernel sharing groups
# --------------------------------------------------------------------------- #

def _dist2(a: Tuple[int, int], b: Tuple[int, int]) -> int:
    return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2


@functools.lru_cache(maxsize=None)
def kernel_groups(ksz: int, ktype: str) -> Optional[Tuple[Tuple[int, ...], ...]]:
    """Flat-index groups of 4D kernel entries sharing one weight.

    Returns None for ktype='full'. Group *order* matches the reference's dict
    insertion order (iteration over idx4d), which matters for weight import.
    """
    if ktype == "full":
        return None
    center = (ksz // 2, ksz // 2)
    groups: Dict[str, List[int]] = {}
    # reference idx4d ordering: i3 slowest ... i0 fastest (geometry.py:init_idx4d)
    for si in range(ksz):
        for sj in range(ksz):
            for ti in range(ksz):
                for tj in range(ksz):
                    d_tail = _dist2((si, sj), center)
                    d_head = _dist2((ti, tj), center)
                    d_off = _dist2((si, sj), (ti, tj))
                    if ktype == "iso":
                        key = f"{d_off}"
                    elif ktype == "psi":
                        key = f"{max(d_head, d_tail)}_{min(d_head, d_tail)}_{d_off}"
                    else:
                        raise ValueError(ktype)
                    flat = si * ksz**3 + sj * ksz**2 + ti * ksz + tj
                    groups.setdefault(key, []).append(flat)
    return tuple(tuple(v) for v in groups.values())


def _spread_weights(weights: jnp.ndarray, groups, ksz: int,
                    extra_div: float = 1.0) -> jnp.ndarray:
    """(n_groups,) -> (ksz^4,) kernel with w/len(group)/extra_div per entry."""
    kernel = jnp.zeros((ksz**4,), weights.dtype)
    for g, idx in enumerate(groups):
        kernel = kernel.at[np.asarray(idx)].set(weights[g] / (len(idx) * extra_div))
    return kernel


def _abs_normal_init(key, shape, dtype=jnp.float32):
    return jnp.abs(jax.random.normal(key, shape, dtype))


def _convnd_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _shared_weight_init(groups):
    def init(key, shape, dtype=jnp.float32):
        w = jnp.abs(jax.random.normal(key, shape, dtype)) * 1e-3
        lens = jnp.asarray([len(g) for g in groups], dtype)
        return w * lens

    return init


class CHM4d(nn.Module):
    """Parameter-shared 4D Hough matching conv (1 in / 1 out channel)."""

    ksz: int = 5
    ktype: str = "psi"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, h, w, hs, ws, 1)
        groups = kernel_groups(self.ksz, self.ktype)
        if groups is None:
            # reference takes |w| once at init only (base/chm.py:111); the
            # kernel itself is unconstrained during training
            kernel_flat = self.param(
                "weight", _abs_normal_init, (self.ksz**4,)
            )
        else:
            w = self.param("weight", _shared_weight_init(groups), (len(groups),))
            kernel_flat = _spread_weights(w, groups, self.ksz)
        kernel = kernel_flat.reshape(self.ksz, self.ksz, self.ksz, self.ksz, 1, 1)
        # reference bias init: shared kernels keep _ConvNd's uniform bias,
        # the full kernel resets it to 0 (base/chm.py:109-112)
        bias_init = (
            nn.initializers.zeros if groups is None
            else _convnd_bias_init(self.ksz**4)
        )
        bias = self.param("bias", bias_init, ()) if self.use_bias else None
        out = conv4d(x, kernel)
        if bias is not None:
            out = out + bias
        return out


class CHM6d(nn.Module):
    """6D Hough matching over (scale, scale, h, w, hs, ws), kernel (3,3,k,k,k,k).

    Scale axes use *flipped*-kernel convolution (the reference's diagonal-sum
    + reverse construction); spatial axes use the shared 4D kernel per scale
    offset, scaled by 1/len(scale-group) like the reference.
    """

    ksz6d: int = 3
    ksz4d: int = 3
    ktype: str = "psi"

    @nn.compact
    def __call__(self, corr: jnp.ndarray) -> jnp.ndarray:
        # corr: (B, s, s, h, w, hs, ws) with s = 3 scale positions
        b, s1, s2, h, w, hs, ws = corr.shape
        groups = kernel_groups(self.ksz4d, self.ktype)
        assert groups is not None, "full 6D kernel not supported (as in reference)"

        if self.ktype == "psi":
            scale_groups = [[4], [0, 8], [2, 6], [1, 3, 5, 7]]
        elif self.ktype == "iso":
            scale_groups = [[0, 4, 8], [2, 6], [1, 3, 5, 7]]
        else:
            raise ValueError(self.ktype)

        params = [
            self.param(f"param_{i}", _shared_weight_init_scaled(groups, len(sg)),
                       (len(groups),))
            for i, sg in enumerate(scale_groups)
        ]
        bias = self.param("bias", _chm6d_bias_init, ())

        # build the (3, 3, ksz^4) kernel: one 4D kernel per scale offset
        k6 = jnp.zeros((self.ksz6d * self.ksz6d, self.ksz4d**4), corr.dtype)
        for w_g, sg in zip(params, scale_groups):
            k4 = _spread_weights(w_g, groups, self.ksz4d, extra_div=len(sg))
            k6 = k6.at[np.asarray(sg)].set(k4)
        k6 = k6.reshape(self.ksz6d, self.ksz6d, -1)

        # Fold the s1*s2 scale-pair grid into the 4D conv's CHANNELS: the
        # flipped scale convolution out[a, b] += K[da, db] * x[a + da - pad,
        # b + db - pad] is a linear mix of scale pairs, so it is exactly ONE
        # conv4d with a block-sparse (s1*s2 -> s1*s2) channel-mixing kernel.
        # The per-offset form emitted s1*s2*ksz6d^2 separate whole-volume
        # conv3d stacks (45 convs at the 473px protocol) whose HLO took ~15
        # minutes to compile; this form emits one conv4d (ksz4d conv3d
        # slices) — same math, same weights, ~5x fewer huge convolutions,
        # and s1*s2-channel lanes instead of single-channel padding waste.
        pad = self.ksz6d // 2
        nsp = s1 * s2
        kch = jnp.zeros((self.ksz4d, self.ksz4d, self.ksz4d, self.ksz4d,
                         nsp, nsp), corr.dtype)
        for a in range(s1):
            for b2 in range(s2):
                for da in range(self.ksz6d):
                    for db in range(self.ksz6d):
                        ai, bi = a + da - pad, b2 + db - pad
                        if 0 <= ai < s1 and 0 <= bi < s2:
                            kch = kch.at[..., ai * s2 + bi, a * s2 + b2].set(
                                k6[da, db].reshape((self.ksz4d,) * 4))
        x = corr.reshape(b, nsp, h, w, hs, ws).transpose(0, 2, 3, 4, 5, 1)
        out = conv4d(x, kch)
        out = out.transpose(0, 5, 1, 2, 3, 4).reshape(b, s1, s2, h, w, hs, ws)
        return out + bias


def _shared_weight_init_scaled(groups, n_scale: int):
    def init(key, shape, dtype=jnp.float32):
        w = jnp.abs(jax.random.normal(key, shape, dtype)) * 1e-3
        lens = jnp.asarray([len(g) * n_scale for g in groups], dtype)
        return w * lens

    return init


def _chm6d_bias_init(key, shape, dtype=jnp.float32):
    # torch _ConvNd bias init: U(+-1/sqrt(fan_in)), fan_in = prod(kernel)
    bound = 1.0 / math.sqrt(3 * 3 * 5 * 5 * 5 * 5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# --------------------------------------------------------------------------- #
# CHMLearner head
# --------------------------------------------------------------------------- #

def build_correlation6d(src_feat, trg_feat, scales, convs) -> jnp.ndarray:
    """Multi-scale cosine correlations -> (B, S, S, side, side, side, side).

    Mirrors reference Correlation.build_correlation6d
    (src/model/base/correlation.py:27-67) incl. the relu clamp.
    """
    b, side, _, _ = src_feat.shape
    srcs, trgs = [], []
    for scale, conv in zip(scales, convs):
        s = round(side * math.sqrt(scale))
        srcs.append(conv(upsample_bilinear_ac(src_feat, (s, s))))
        trgs.append(conv(upsample_bilinear_ac(trg_feat, (s, s))))

    vols = []
    for sf in srcs:
        sflat = sf.reshape(b, -1, sf.shape[-1])
        snorm = jnp.linalg.norm(sflat, axis=2, keepdims=True)
        for tf in trgs:
            tflat = tf.reshape(b, -1, tf.shape[-1])
            tnorm = jnp.linalg.norm(tflat, axis=2, keepdims=True)
            corr = jnp.einsum("bqc,bkc->bqk", sflat, tflat) / jnp.maximum(
                snorm * tnorm.transpose(0, 2, 1), 1e-30
            )
            ss, ts = sf.shape[1], tf.shape[1]
            corr = corr.reshape(b, ss, ss, ts, ts)
            vols.append(interpolate4d(corr, side))

    s = len(scales)
    stacked = jnp.stack(vols).reshape(s, s, b, side, side, side, side)
    return jnp.clip(stacked.transpose(2, 0, 1, 3, 4, 5, 6), 0.0, None)


def interpolate4d(t: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear(align_corners) resize of both planes of (B, h1, w1, h2, w2)."""
    b, h1, w1, h2, w2 = t.shape
    x = t.reshape(b, h1, w1, h2 * w2)
    x = upsample_bilinear_ac(x, (size, size))              # query plane
    x = x.reshape(b, size * size, h2, w2).transpose(0, 2, 3, 1)
    x = upsample_bilinear_ac(x, (size, size))              # support plane
    return x.transpose(0, 3, 1, 2).reshape(b, size, size, size, size)


class CHMLearner(nn.Module):
    ktype: str = "psi"
    feat_dim: int = 2048
    temp: float = 20.0

    @nn.compact
    def __call__(self, src_feat, trg_feat, v, ig_mask=None, ret_corr: bool = False):
        # src/trg: (B, side, side, C) hi-level features; v: support values
        scales = [0.5, 1.0, 2.0]
        convs = [
            nn.Conv(self.feat_dim // 4, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name=f"scale_conv_{i}")
            for i in range(len(scales))
        ]
        corr = build_correlation6d(src_feat, trg_feat, scales, convs)
        b, s, _, h, w, _, _ = corr.shape

        corr = CHM6d(ksz6d=3, ksz4d=5, ktype=self.ktype, name="chm6d")(corr)
        corr = jax.nn.sigmoid(corr)
        corr = corr.reshape(b, s * s, h, w, h, w).max(axis=1)    # scale max-pool
        corr = interpolate4d(corr, h * 2)
        corr = CHM4d(ksz=5, ktype=self.ktype, name="chm4d")(
            corr.reshape(b, 2 * h, 2 * w, 2 * h, 2 * w, 1)
        )[..., 0]
        corr = jax.nn.softplus(corr)
        n = (2 * h) * (2 * w)
        corr2d = mutual_nn_filter(corr.reshape(b, n, n))

        out = masked_attention_readout(
            corr2d, v, temp=self.temp, ig_mask=ig_mask
        ).reshape(b, 2 * h, 2 * w, -1)
        if ret_corr:
            return out, corr2d
        return out
