"""4D convolutions over correlation volumes, transpose-free.

Two flavours, mirroring the reference (reference: src/model/conv4d.py):

* ``CenterPivotConv4d`` (HSNet-style, src:11-62): the 4D kernel is restricted
  to its two center-pivot planes, so the op is exactly two 2D convolutions —
  one over the query plane (h, w), one over the support plane (h_s, w_s).
* ``Conv4d`` (true 4D, src:65-138): implemented as a sum of shifted 3D
  convolutions over one kernel axis (XLA lowers 3 spatial dims natively),
  replacing the reference's Python loop over the first spatial axis.

Volume layout is channels-last: (B, h, w, h_s, w_s, C).

TPU notes (measured with tools/bench_head_parts.py on v5e):

* the support-plane conv runs on the free row-major view
  ``(B*h*w, h_s, w_s, C)`` — a pure reshape;
* the query-plane conv batches over (h_s, w_s) via an explicit plane
  transpose, which XLA absorbs into the convolution's layout assignment;
  a "conv3d with size-1 trailing spatial dim" formulation that avoids the
  transpose measured 2.4x SLOWER end-to-end, so it was rejected;
* ``swap_roles=True`` applies the query kernel to the support planes and
  vice versa, which is exactly ``swap(conv(swap(x)))`` without materializing
  either whole-volume swap — used by NeighConsensus's symmetric mode, and
  the layout contract the fused Pallas pivot kernel builds on.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch Conv2d default init for conv4d sub-convs
_default_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def qplane_hwnc_active() -> bool:
    """True when the rank-4 route's query-plane conv runs "transpose-free".

    The candidate route feeds XLA:TPU the free ``(hq, wq, sn, C)`` view of
    the volume with the BATCH dim on dim 2 (``("HWNC", "HWIO", "HWNC")``
    dimension numbers) instead of batching the query-plane conv as NHWC via
    two whole-volume rank-4 permutations. OFF BY DEFAULT: the end-to-end
    A/B on the real chip (BENCH.md round 5, "query-plane conv layout")
    measured the HWNC route at **3.63 eps/s vs 6.21 eps/s** for the
    transpose route (mmn fp32 train step @473px) with program HBM blown
    from 13.7 to 15.9 GB — XLA:TPU does NOT lower the batch-on-dim-2 conv
    natively; it materializes a worse internal layout than the two explicit
    permutations it was meant to save. ``FSS_QPLANE_HWNC=1`` opts in (the
    math is identical — tests/test_matching_r4.py — so the A/B stays one
    env var away if a future XLA release fixes the lowering). Like
    FSS_NCONS_R4, the flag is read at TRACE time and is not part of any
    jit cache key: set it before the first compile of a step; toggling it
    afterwards has no effect on already-compiled functions.
    """
    import os

    return os.environ.get("FSS_QPLANE_HWNC") == "1"


def _uniform_bias_init(kernel_hw: int):
    def init(key, shape, dtype=jnp.float32):
        # torch Conv2d bias: U(+-1/sqrt(fan_in)); fan_in known at module level
        bound = 1.0 / jnp.sqrt(jnp.asarray(kernel_hw, jnp.float32))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _ConvParams(nn.Module):
    """Parameter container matching flax nn.Conv's {kernel, bias} tree.

    Keeps the checkpoint/import structure identical to the previous
    nn.Conv-based implementation while the convolution itself is applied
    manually (lax.conv_general_dilated on reshaped views).
    """

    features: int
    in_features: int
    kernel_size: Tuple[int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", _default_kernel_init, (kh, kw, self.in_features, self.features)
        )
        # zeros bias = flax nn.Conv's default, which the previous nn.Conv-based
        # implementation used; kept so fresh-init behavior is unchanged
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return kernel, bias


def _promote(x: jnp.ndarray, kernel: jnp.ndarray):
    """Conv compute dtype: autocast-faithful under AMP, promoted otherwise.

    Under use_amp the head params are bf16 while the correlation volume is
    f32 (get_corr accumulates f32). The reference's torch.cuda.amp autocasts
    its convolutions to HALF precision (src/train_kshot.py:146-190), so when
    the kernel arrives bf16 we cast the volume DOWN and run the conv in bf16
    — which halves the whole-volume bandwidth these bandwidth-bound convs
    and their plane transposes pay (BENCH.md round 4). With f32 kernels
    (no AMP) both meet at f32, like the previous nn.Conv-based
    implementation.
    """
    if kernel.dtype == jnp.bfloat16:
        return x.astype(jnp.bfloat16), kernel
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    return x.astype(dt), kernel.astype(dt)


def _conv_query_planes(x: jnp.ndarray, kernel: jnp.ndarray,
                       strides, padding, bias=None) -> jnp.ndarray:
    """Conv over dims (1, 2) of (B, h, w, hs, ws, C), batched over (hs, ws).

    Measured on v5e: XLA absorbs the plane transpose into the convolution's
    layout assignment, while the "conv3d with a size-1 trailing spatial dim"
    formulation is 2.4x slower end-to-end (tools/bench_head_parts.py probes)
    — so the batched-2D form with an explicit transpose is the fast one.
    The bias is added on the conv's IMMEDIATE (batched-2D) output, exactly
    like nn.Conv: adding it on the restored 6D volume instead created an
    extra whole-volume op per block (+ a second full-volume reduce in its
    VJP) and pushed the 473px MMN train step out of HBM.
    """
    b, h, w, hs, ws, c = x.shape
    kh, kw, ci, co = kernel.shape
    x, kernel = _promote(x, kernel)
    t = x.transpose(0, 3, 4, 1, 2, 5).reshape(b * hs * ws, h, w, c)
    dn = jax.lax.conv_dimension_numbers(
        t.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    out = jax.lax.conv_general_dilated(
        t, kernel, window_strides=tuple(strides),
        padding=[(padding[0],) * 2, (padding[1],) * 2],
        dimension_numbers=dn,
    )
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, co).astype(out.dtype)
    oh, ow = out.shape[1], out.shape[2]
    return out.reshape(b, hs, ws, oh, ow, co).transpose(0, 3, 4, 1, 2, 5)


def _conv_support_planes(x: jnp.ndarray, kernel: jnp.ndarray,
                         strides, padding, bias=None) -> jnp.ndarray:
    """Conv over dims (3, 4) of (B, h, w, hs, ws, C): free batched-2D view.

    Bias on the immediate conv output (see _conv_query_planes)."""
    b, h, w, hs, ws, c = x.shape
    kh, kw, ci, co = kernel.shape
    x, kernel = _promote(x, kernel)
    dn = jax.lax.conv_dimension_numbers(
        (b * h * w, hs, ws, c), (kh, kw, ci, co), ("NHWC", "HWIO", "NHWC")
    )
    out = jax.lax.conv_general_dilated(
        x.reshape(b * h * w, hs, ws, c),
        kernel,
        window_strides=tuple(strides),
        padding=[(padding[0],) * 2, (padding[1],) * 2],
        dimension_numbers=dn,
    )
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, co).astype(out.dtype)
    ohs, ows = out.shape[1], out.shape[2]
    return out.reshape(b, h, w, ohs, ows, co)


class CenterPivotConv4d(nn.Module):
    """Center-pivot 4D conv: conv over (h,w) + conv over (hs,ws).

    ``swap_roles=True`` computes ``swap_planes(self(swap_planes(x)))`` —
    the query kernel convolves the support planes and vice versa — without
    materializing either transpose.

    Two input layouts:

    * channels-last 6D ``(B, h, w, hs, ws, C)`` (default; XLA convs);
    * flat channels-major ``(B, C, h*w, hs*ws)`` when ``flat_dims=(h, w,
      hs, ws)`` is passed — the natural layout of a correlation volume
      (``get_corr`` emits it directly). On TPU with the standard 3^4
      stride-1 config this dispatches to the fused Pallas pivot kernel
      (ops/pallas_pivot.py, optional fused ReLU via ``fuse_relu``);
      elsewhere it falls back to the 6D math;
    * flat channels-LAST rank-4 ``(B, h*w, hs*ws, C)`` when additionally
      ``bqsc=True`` — the fast TPU path (round 4). Both plane convs are
      reshape-batched NHWC convs; the query-plane conv's transpose is a
      genuine rank-4 ``(0, 2, 1, 3)`` permutation, which XLA:TPU lowers
      ~3x faster than the 6D plane swap (3.6 ms vs 11.2 ms for the 518 MB
      10-channel volume; measured with tools/bench_head_parts chains).
      Keeping every tensor rank-4 is load-bearing: reshaping to 6D
      anywhere lets XLA canonicalize reshape-transpose-reshape back into
      the slow 6D transpose (measured 11.9 ms for the identical movement).
    """

    out_channels: int
    kernel_size: Sequence[int] = (3, 3, 3, 3)
    stride: Sequence[int] = (1, 1, 1, 1)
    padding: Sequence[int] = (1, 1, 1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, swap_roles: bool = False,
                 fuse_relu: bool = False,
                 flat_dims: Tuple[int, int, int, int] | None = None,
                 bqsc: bool = False) -> jnp.ndarray:
        c_in = x.shape[-1] if bqsc else (
            x.shape[1] if flat_dims is not None else x.shape[-1])
        k = self.kernel_size
        s = self.stride
        p = self.padding

        kq, bq = _ConvParams(self.out_channels, c_in, (k[0], k[1]),
                             self.use_bias, name="conv_query")()
        ks, bs = _ConvParams(self.out_channels, c_in, (k[2], k[3]),
                             self.use_bias, name="conv_support")()

        if bqsc:
            if flat_dims is None:
                raise ValueError("bqsc layout requires flat_dims=(h, w, hs, ws)")
            return self._bqsc(x, kq, ks, bq, bs, swap_roles, fuse_relu,
                              tuple(int(d) for d in flat_dims))
        if flat_dims is not None:
            return self._flat(x, kq, ks, bq, bs, swap_roles, fuse_relu,
                              tuple(int(d) for d in flat_dims))

        if not swap_roles:
            # branch 1: query-plane conv; support grid pruned by stride
            x1 = x
            if s[2] > 1 or s[3] > 1:
                x1 = x1[:, :, :, :: s[2], :: s[3], :]
            out = _conv_query_planes(x1, kq, (s[0], s[1]), (p[0], p[1]), bq)
            # branch 2: support-plane conv, batched over query positions
            out = out + _conv_support_planes(x, ks, (s[2], s[3]), (p[2], p[3]), bs)
        else:
            # swapped orientation: what was the "query" kernel now convolves
            # the support planes (and prunes the query grid), and vice versa
            x1 = x
            if s[2] > 1 or s[3] > 1:
                x1 = x1[:, :: s[2], :: s[3], :, :, :]
            out = _conv_support_planes(x1, kq, (s[0], s[1]), (p[0], p[1]), bq)
            out = out + _conv_query_planes(x, ks, (s[2], s[3]), (p[2], p[3]), bs)

        if fuse_relu:
            out = nn.relu(out)
        return out

    def _bqsc(self, x, kq, ks, bq, bs, swap_roles, fuse_relu, dims):
        """Rank-4 channels-last path: x (B, h*w, hs*ws, C) -> (B, h*w, hs*ws, co).

        Both plane convolutions are reshape-batched NHWC 2D convs; the
        query-plane conv transposes via the rank-4 (0, 2, 1, 3) permutation,
        which XLA:TPU lowers ~3x faster than the equivalent 6D plane swap
        (the tensors must STAY rank-4 — see the class docstring). Bias lands
        on each conv's immediate output (nn.Conv parity; adding it on the
        summed volume instead costs an extra whole-volume op + reduce in the
        VJP). Exactly the 6D math, verified by tests/test_matching_r4.py.
        """
        if tuple(self.stride) != (1, 1, 1, 1):
            raise ValueError(
                f"bqsc layout supports stride 1 only, got {self.stride}")
        hq, wq, hs, ws = dims
        b, qn, sn, c = x.shape
        co = self.out_channels
        p = self.padding
        # the kernel keeps its own padding whichever planes it convolves
        # (6D-path semantics: swap_roles hands kq to the support planes)
        k_s, b_s, pad_s = ((kq, bq, (p[0], p[1])) if swap_roles
                           else (ks, bs, (p[2], p[3])))
        k_q, b_q, pad_q = ((ks, bs, (p[2], p[3])) if swap_roles
                           else (kq, bq, (p[0], p[1])))

        from ..ops.quant import fake_quant, ncons_int8_mode, qconv2d

        int8_mode = ncons_int8_mode()

        def plane_conv(t, kern, bias, pad, spec="NHWC"):
            t, kern = _promote(t, kern)
            if int8_mode == "dot":
                # int8 execution (ops/quant.py): int8 operands + int32 MXU
                # accumulation, STE backward from int8 residuals
                out = qconv2d(t, kern, tuple(pad), spec, t.dtype).astype(t.dtype)
            else:
                if int8_mode == "fake":
                    # accuracy probe: int8 noise, unchanged execution dtype
                    t = fake_quant(t)
                    kern = fake_quant(kern)
                dn = jax.lax.conv_dimension_numbers(
                    t.shape, kern.shape, (spec, "HWIO", spec))
                out = jax.lax.conv_general_dilated(
                    t, kern, (1, 1), [(pad[0],) * 2, (pad[1],) * 2],
                    dimension_numbers=dn)
            if bias is not None:
                out = out + bias.reshape(1, 1, 1, co).astype(out.dtype)
            return out

        s_out = plane_conv(x.reshape(b * qn, hs, ws, c), k_s, b_s,
                           pad_s).reshape(b, qn, sn, co)
        if b == 1 and qplane_hwnc_active():
            # opt-in (FSS_QPLANE_HWNC=1) batch-on-dim-2 query-plane conv:
            # identical math (tests/test_matching_r4.py) but MEASURED SLOWER
            # than the transpose route on XLA:TPU — 3.63 vs 6.21 eps/s mmn
            # fp32 (BENCH.md round 5, "query-plane conv layout"). Kept as a
            # one-env-var A/B against future XLA lowering changes.
            q_out = plane_conv(x.reshape(hq, wq, sn, c), k_q, b_q,
                               pad_q, "HWNC").reshape(1, qn, sn, co)
        else:
            x_t = x.transpose(0, 2, 1, 3)
            q_out = plane_conv(x_t.reshape(b * sn, hq, wq, c), k_q, b_q,
                               pad_q).reshape(b, sn, qn, co).transpose(0, 2, 1, 3)
        out = s_out + q_out
        if fuse_relu:
            out = nn.relu(out)
        return out

    def _flat(self, x, kq, ks, bq, bs, swap_roles, fuse_relu, dims):
        """(B, C, Q, S) path: a Pallas pivot kernel when one is enabled
        (pivot_impl: "mxu" dot-form or the round-3 "vpu" FMA form), 6D math
        otherwise."""
        import os

        from ..ops.pallas_pivot import (pivot_conv_flat, pivot_impl,
                                        pivot_kernel_available)

        if tuple(self.stride) != (1, 1, 1, 1):
            # a hard error (not assert): under python -O or a new caller
            # passing flat_dims with a strided config this must not degrade
            # to silently wrong shapes
            raise ValueError(
                f"flat layout supports stride 1 only, got {self.stride}")
        wa, wb = (ks, kq) if swap_roles else (kq, ks)
        bias = (bq + bs) if self.use_bias else jnp.zeros(
            (self.out_channels,), jnp.float32)
        interpret = os.environ.get("FSS_PIVOT_INTERPRET") == "1"
        impl = pivot_impl() if pivot_kernel_available(
            self.kernel_size, self.stride, self.padding) else None
        if impl == "mxu":
            from ..ops.pallas_pivot_mxu import pivot_conv_flat_mxu

            return pivot_conv_flat_mxu(x, wa, wb, bias, dims=dims,
                                       relu=fuse_relu, interpret=interpret)
        if impl == "vpu":
            return pivot_conv_flat(x, wa, wb, bias, dims=dims,
                                   relu=fuse_relu, interpret=interpret)
        # fallback: run the 6D math (tests/CPU; transposes are fine there)
        hq, wq, hs, ws = dims
        b = x.shape[0]
        x6 = x.reshape(b, -1, hq, wq, hs, ws).transpose(0, 2, 3, 4, 5, 1)
        sdims = ((self.stride[0], self.stride[1]), (self.stride[2], self.stride[3]))
        pdims = ((self.padding[0], self.padding[1]), (self.padding[2], self.padding[3]))
        if not swap_roles:
            out = (_conv_query_planes(x6, kq, sdims[0], pdims[0])
                   + _conv_support_planes(x6, ks, sdims[1], pdims[1]))
        else:
            out = (_conv_support_planes(x6, kq, sdims[0], pdims[0])
                   + _conv_query_planes(x6, ks, sdims[1], pdims[1]))
        out = out + bias.astype(out.dtype)
        if fuse_relu:
            out = nn.relu(out)
        oh, ow, ohs, ows = out.shape[1], out.shape[2], out.shape[3], out.shape[4]
        return out.transpose(0, 5, 1, 2, 3, 4).reshape(
            b, self.out_channels, oh * ow, ohs * ows)


def conv4d_im2col_mode() -> str:
    """True-4D conv forward route selector (``FSS_CONV4D_IM2COL``).

    The CHM kernels are 1-to-9-channel 4D convs — as looped conv3d's they
    hand XLA:TPU convolutions whose channel dim fills under 8% of the
    128-lane MXU tile. The im2col routes fold query-plane kernel taps into
    the CHANNEL dim instead (identical math, exactness-tested in
    tests/test_conv4d_im2col.py):

    * ``"qp"``: ONE support-plane conv2d with ``k0*k1*ci`` input channels
      (225 for CHM6d) at a ``k0*k1``x input-memory cost (im2col buffer);
    * ``"q"``: ``k0`` conv2d's with ``k1*ci`` channels (``k1``x memory);
    * ``"gemm"``: NO conv HLOs at all — im2col over the query taps, one
      dense ``(k0*k1*ci, k2*k3*co)`` matmul mixing query taps into support
      taps, then a col2im shifted-add over the support planes. The measured
      chm4d conv sits exactly at the 1-output-channel MXU fill cap
      (251 GFLOP/s ~= 32 TF/s / 128 lanes); the matmul form contracts over
      taps*channels instead, and plain autodiff yields matmul grads (dk is
      one MXU-perfect ``(taps, P) x (P, taps)`` contraction instead of the
      k0*k1-step scanned kernel-grad, and the compile-pathological conv
      kernel-grad emitter is out of the program entirely);
    * ``"0"``/``"loop"``: the shifted-conv3d loop (the round-4 default).

    ``"q"`` is the DEFAULT (unset): the round-5 on-chip end-to-end A/B
    (BENCH.md "CHM conv4d route matrix") measured the chm train step at
    4.326 eps/s fp32 / 4.218 amp on ``q`` vs 2.414 / 2.269 on the loop
    route (+79%, +1.75 GB, compile 159 s -> 97 s); ``qp`` and ``gemm``
    drown their MXU-fill win in im2col buffer bandwidth (2.12 / 1.64
    fp32) and stay opt-in probes. Read at TRACE time; not part of any
    jit cache key — set before the first jitted compile.
    """
    import os

    v = os.environ.get("FSS_CONV4D_IM2COL", "q")
    if v == "":
        v = "q"
    if v in ("0", "loop"):
        return "loop"
    if v in ("1", "qp"):
        return "qp"
    if v in ("q", "gemm"):
        return v
    raise ValueError(f"FSS_CONV4D_IM2COL must be '', '0', 'loop', '1', "
                     f"'qp', 'q' or 'gemm', got {v!r}")


def _conv4d_fwd_im2col(x: jnp.ndarray, kernel: jnp.ndarray,
                       fold_all: bool) -> jnp.ndarray:
    """4D conv fwd with query-plane taps folded into conv channels.

    out[b,H,W,s,t,co] = sum_{p,q,r,s'} K[p,q,r,s',ci,co] * xpad[b,H+p,W+q,
    s+r,t+s',ci] — gathering the (p,q) taps as channels makes this a plain
    support-plane conv2d with (k2,k3) window and k0*k1*ci input channels
    (batch b*h*w). fold_all=False folds only the q axis (k0 convs of
    k1*ci channels) to cap the im2col buffer at k1x the input.
    """
    b, h, w, hs, ws, ci = x.shape
    k0, k1, k2, k3 = kernel.shape[:4]
    co = kernel.shape[-1]
    p0, p1 = k0 // 2, k1 // 2
    pad_s = [(k2 // 2,) * 2, (k3 // 2,) * 2]

    def splane_conv(t, kern):
        # t: (N, hs, ws, C), kern: (k2, k3, C, co)
        dn = jax.lax.conv_dimension_numbers(t.shape, kern.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            t, kern, (1, 1), pad_s, dimension_numbers=dn)

    if fold_all:
        xp = jnp.pad(x, ((0, 0), (p0, p0), (p1, p1), (0, 0), (0, 0), (0, 0)))
        # channel order [p slowest, q, ci fastest] must match the kernel
        # reshape below
        taps = [xp[:, p : p + h, q : q + w]
                for p in range(k0) for q in range(k1)]
        xt = jnp.concatenate(taps, axis=-1)             # (b,h,w,hs,ws,k0*k1*ci)
        kf = kernel.transpose(2, 3, 0, 1, 4, 5).reshape(k2, k3, k0 * k1 * ci, co)
        o = splane_conv(xt.reshape(b * h * w, hs, ws, k0 * k1 * ci), kf)
        return o.reshape(b, h, w, hs, ws, co)

    xp = jnp.pad(x, ((0, 0), (p0, p0), (p1, p1), (0, 0), (0, 0), (0, 0)))
    out = None
    for p in range(k0):
        taps = [xp[:, p : p + h, q : q + w] for q in range(k1)]
        xt = jnp.concatenate(taps, axis=-1)             # (b,h,w,hs,ws,k1*ci)
        kf = kernel[p].transpose(1, 2, 0, 3, 4).reshape(k2, k3, k1 * ci, co)
        o = splane_conv(xt.reshape(b * h * w, hs, ws, k1 * ci), kf)
        out = o if out is None else out + o
    return out.reshape(b, h, w, hs, ws, co)


def _conv4d_gemm(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """4D conv as im2col -> one tap-mixing matmul -> col2im. Plain jnp ops,
    differentiable by autodiff (no custom VJP, no conv HLOs).

    out[b,H,W,U,V,co]
      = sum_{p,q,r,s,ci} K[p,q,r,s,ci,co] * xpad[b,H+p,W+q,U+r,V+s,ci]
      = sum_{r,s} Y[b,H,W,U+r-p2,V+s-p3,(r,s,co)]
    with Y = taps @ km, taps the query-tap im2col (b,h,w,hs,ws,k0*k1*ci)
    and km the kernel as a (k0*k1*ci, k2*k3*co) matrix. The contraction
    runs over taps*channels (25*ci for a 5x5x5x5 kernel) instead of the
    conv form's ci alone, and the output dim is k2*k3*co instead of co —
    which is what lets a 1->1-channel CHM4d escape the 1/128 MXU fill cap
    its conv form is measured at. Memory: the taps and Y buffers are each
    ~k0*k1 x the input volume.
    """
    b, h, w, hs, ws, ci = x.shape
    k0, k1, k2, k3 = kernel.shape[:4]
    co = kernel.shape[-1]
    p0, p1, p2, p3 = k0 // 2, k1 // 2, k2 // 2, k3 // 2
    x, kernel = _promote(x, kernel)
    xp = jnp.pad(x, ((0, 0), (p0, p0), (p1, p1), (0, 0), (0, 0), (0, 0)))
    # channel order [p slowest, q, ci fastest] matches km's ravel below
    taps = jnp.concatenate(
        [xp[:, p : p + h, q : q + w] for p in range(k0) for q in range(k1)],
        axis=-1)                                    # (b,h,w,hs,ws,k0*k1*ci)
    km = kernel.transpose(0, 1, 4, 2, 3, 5).reshape(k0 * k1 * ci, k2 * k3 * co)
    y = taps.reshape(-1, k0 * k1 * ci) @ km
    y = y.reshape(b, h, w, hs, ws, k2, k3, co)
    yp = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (p2, p2), (p3, p3),
                     (0, 0), (0, 0), (0, 0)))
    out = None
    for r in range(k2):
        for s in range(k3):
            o = yp[:, :, :, r : r + hs, s : s + ws, r, s]
            out = o if out is None else out + o
    return out


def _conv4d_fwd(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 same-padding 4D conv as shifted 3D convs (the fast-compiling
    form: XLA:TPU emits a forward conv3d at these shapes in ~10 s), or the
    channel-folded im2col form when FSS_CONV4D_IM2COL selects it."""
    mode = conv4d_im2col_mode()
    if mode == "gemm":
        # reached only via a direct _conv4d call (conv4d() routes gemm
        # around the custom VJP); keep the forward consistent either way
        return _conv4d_gemm(x, kernel)
    if mode != "loop":
        return _conv4d_fwd_im2col(x, kernel, fold_all=(mode == "qp"))
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
    return out.reshape(b, h, w, hs, ws, c_out)


def _conv4d_dk(x: jnp.ndarray, g: jnp.ndarray, k) -> jnp.ndarray:
    """Kernel gradient of the stride-1 same-padding 4D conv, emitted as ONE
    scanned 2D kernel-grad instruction with k0*k1 steps.

    XLA:TPU's conv kernel-grad emitter is compile-pathological at this
    problem's sizes (isolated probes on v5e: 3D kgrad at 120^3 batch 1 =
    202 s, 2D kgrad at batch 14400 = 91 s, the full conv4d dk = 384 s —
    vs 27 s for a 2D kgrad at batch ~120). So dk is computed exactly as
    dk[p,q,r,s,ci,co] = sum over positions of xpad[., h+p, w+q, hs+r,
    ws+s, ci] * g[., h, w, hs, ws, co], scanned over the (p, q) query-plane
    kernel offsets: each step slices the (h, w)-shifted volume view and
    runs the 2D kernel-grad over (hs, ws) with (b*h*w) as the batch — one
    conv HLO total, reused by every step. The round-4a version scanned
    (p, q, h) — k0*k1*h steps of a (b*w)-batch kernel-grad — to keep the
    emitter's compile time down, but 1500 sequential tiny convs made the
    CHM train step RUNTIME-bound on dispatch (measured dtype-invariant,
    2.3 eps/s at f32 AND bf16); the (b*h*w)-batch form is the same single
    HLO at 60x fewer, 60x larger steps.
    """
    b, h, w, hs, ws, ci = x.shape
    co = g.shape[-1]
    k0, k1, k2, k3 = k
    p2, p3 = k2 // 2, k3 // 2
    xp = jnp.pad(x, ((0, 0), (k0 // 2,) * 2, (k1 // 2,) * 2,
                     (p2, p2), (p3, p3), (0, 0)))

    kshape = (k2, k3, ci, co)
    gf = g.reshape(b * h * w, hs, ws, co)

    def kgrad2d(sl, gg):
        # sl: (b*h*w, hs+2*p2, ws+2*p3, ci); gg: (b*h*w, hs, ws, co)
        def conv2(k2d):
            dn = jax.lax.conv_dimension_numbers(sl.shape, kshape,
                                                ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                sl, k2d, (1, 1), "VALID", dimension_numbers=dn)

        _, vjp_fn = jax.vjp(conv2, jnp.zeros(kshape, x.dtype))
        (dk2,) = vjp_fn(gg)
        return dk2                                      # (k2, k3, ci, co)

    def body(_, i):
        p = i // k1
        q = i % k1
        sl = jax.lax.dynamic_slice(
            xp, (0, p, q, 0, 0, 0),
            (b, h, w, hs + 2 * p2, ws + 2 * p3, ci),
        ).reshape(b * h * w, hs + 2 * p2, ws + 2 * p3, ci)
        return None, kgrad2d(sl, gf)

    _, dks = jax.lax.scan(body, None, jnp.arange(k0 * k1))
    return dks.reshape(k0, k1, k2, k3, ci, co)


def _flip_k(kernel: jnp.ndarray) -> jnp.ndarray:
    """Spatially flipped, (ci,co)-transposed kernel — the conv whose forward
    computes the 4D conv's input gradient (stride 1, same padding, odd k)."""
    return kernel[::-1, ::-1, ::-1, ::-1].transpose(0, 1, 2, 3, 5, 4)


@jax.custom_vjp
def _conv4d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return _conv4d_fwd(x, kernel)


def _conv4d_vjp_fwd(x, kernel):
    return _conv4d_fwd(x, kernel), (x, kernel)


def _conv4d_vjp_bwd(res, g):
    x, kernel = res
    # dx: the same fast-compiling forward with the flipped kernel (XLA's own
    # transposed-conv grad also compiles fast — ~7 s — but routing through
    # our forward keeps ONE conv formulation in the program)
    dx = _conv4d_fwd(g, _flip_k(kernel))
    dk = _conv4d_dk(x, g, kernel.shape[:4])
    return dx, dk


_conv4d.defvjp(_conv4d_vjp_fwd, _conv4d_vjp_bwd)


def conv4d(x: jnp.ndarray, kernel: jnp.ndarray,
           bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Full stride-1 4D convolution, decomposed into shifted 3D convs.

    x: (B, h, w, hs, ws, C_in); kernel: (k0, k1, k2, k3, C_in, C_out);
    padding k//2 on every spatial dim (size preserving). Matches the
    reference's looped-conv3d semantics (src/model/conv4d.py:65-106 and
    src/model/base/chm.py:12-37) without the Python-level output indexing.
    Custom VJP: the kernel gradient bypasses XLA:TPU's compile-pathological
    conv-kernel-grad emitter (see _conv4d_dk) — this is what brought the
    473px CHM train-step compile from ~13 minutes to under 3.
    """
    for ksz in kernel.shape[:4]:
        if ksz % 2 != 1:
            raise ValueError(f"conv4d supports odd kernels only, got "
                             f"{kernel.shape[:4]}")
    if conv4d_im2col_mode() == "gemm":
        # matmul form: plain autodiff (its dk IS a matmul — the custom VJP
        # exists to fix the conv form's kernel grad and must not intercept)
        out = _conv4d_gemm(x, kernel)
    else:
        out = _conv4d(x, kernel)
    if bias is not None:
        out = out + bias
    return out


class Conv4d(nn.Module):
    """Full 4D convolution module (stride 1).

    ``swap_roles=True`` is the plane-swapped application (used by symmetric
    NeighConsensus): for a true 4D kernel, ``swap(conv(swap(x), K))`` equals
    ``conv(x, K transposed on its spatial axes (k2, k3, k0, k1))``.
    """

    out_channels: int
    kernel_size: Sequence[int] = (3, 3, 3, 3)
    padding: Sequence[int] = (1, 1, 1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, swap_roles: bool = False) -> jnp.ndarray:
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
        if swap_roles:
            kernel = kernel.transpose(2, 3, 0, 1, 4, 5)
        return conv4d(x, kernel, bias)
