"""int8 quantization for the consensus-volume convolutions (experimental).

The extension heads' center-pivot convolutions are bandwidth-bound on the
(B, h*w, hs*ws, C<=10) correlation volumes (BENCH.md round 4-5): the rank-4
route removed the pathological transposes and bf16 halved the traffic, so
the next candidate lever is sub-bf16 storage/ingest — int8 volumes with
dequantization scales (STATUS round-4 known-gap #3; VERDICT round-5 #4).

Two trace-time modes via ``FSS_NCONS_INT8`` (read like FSS_NCONS_R4 — set
before the first jit compile):

* ``fake``: fake quantization — every consensus conv sees
  ``dequant(quant(x))`` for both operands but executes at the incoming
  dtype. Zero perf effect by construction; isolates the ACCURACY cost of
  int8 volumes (flip rate / mIoU-proxy via the ab machinery).
* ``dot``: real int8 execution — operands are quantized to int8 (volume:
  per-tensor scale; kernel: per-output-channel scales, which factor out of
  the contraction exactly) and the convolution runs as an integer
  ``conv_general_dilated`` with int32 accumulation, rescaled to f32 in the
  epilogue. The backward is the straight-through estimator evaluated on the
  DEQUANTIZED operands (exactly what autodiff through the fake mode
  computes), run as ordinary bf16/f32 convs from int8 residuals — so the
  backward's residual traffic is int8 too.

Quantization details: symmetric, round-to-nearest-even (jnp.round), clip to
[-127, 127]; scales are max(|x|)/127 with a 1e-12 floor. The volume scale is
per-tensor because a per-input-channel scale cannot be factored out of a
cross-channel contraction without per-(ci, co) kernel scales.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def ncons_int8_mode() -> str:
    """'' (off, default) | 'fake' | 'dot'. Trace-time, like FSS_NCONS_R4."""
    v = os.environ.get("FSS_NCONS_INT8", "")
    if v in ("", "0", "off"):
        return ""
    if v in ("fake", "dot"):
        return v
    raise ValueError(f"FSS_NCONS_INT8 must be 'fake' or 'dot', got {v!r}")


def _scale_max(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=axis is not None)
    return jnp.maximum(amax, 1e-12) / 127.0


def quantize_tensor(x: jnp.ndarray):
    """Per-tensor symmetric int8: (q, scale) with x ~= q * scale."""
    s = _scale_max(x)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_per_co(k: jnp.ndarray):
    """Per-output-channel symmetric int8 for an (..., ci, co) kernel."""
    s = _scale_max(k, axis=tuple(range(k.ndim - 1)))     # (1, ..., 1, co)
    q = jnp.clip(jnp.round(k.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s.reshape(-1)                               # (co,)


@jax.custom_vjp
def fake_quant(x: jnp.ndarray) -> jnp.ndarray:
    """dequant(quant(x)) at x's dtype, with a straight-through gradient."""
    q, s = quantize_tensor(x)
    return (q.astype(jnp.float32) * s).astype(x.dtype)


def _fq_fwd(x):
    return fake_quant(x), None


def _fq_bwd(_, g):
    return (g,)


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def _conv2d(x, k, pad, spec, prefer=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, (spec, "HWIO", spec))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad[0],) * 2, (pad[1],) * 2],
        dimension_numbers=dn, preferred_element_type=prefer)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def qconv2d(x: jnp.ndarray, k: jnp.ndarray, pad, spec: str, grad_dtype):
    """2D conv executed in int8 (int32 accumulation), f32 result.

    x: a plane view with dimension order ``spec`` ("NHWC" or "HWNC");
    k: (kh, kw, ci, co). Forward quantizes both operands and runs the
    integer convolution; backward is the STE gradient on the dequantized
    operands (standard convs at ``grad_dtype``), computed from the int8
    residuals.
    """
    xq, sx = quantize_tensor(x)
    kq, sk = quantize_per_co(k)
    o = _conv2d(xq, kq, pad, spec, prefer=jnp.int32)
    co_shape = (1,) * (o.ndim - 1) + (-1,)
    return o.astype(jnp.float32) * (sx * sk.reshape(co_shape))


def _qconv2d_fwd(x, k, pad, spec, grad_dtype):
    xq, sx = quantize_tensor(x)
    kq, sk = quantize_per_co(k)
    o = _conv2d(xq, kq, pad, spec, prefer=jnp.int32)
    co_shape = (1,) * (o.ndim - 1) + (-1,)
    out = o.astype(jnp.float32) * (sx * sk.reshape(co_shape))
    return out, (xq, sx, kq, sk)


def _qconv2d_bwd(pad, spec, grad_dtype, res, g):
    xq, sx, kq, sk = res
    dt = grad_dtype
    x_deq = xq.astype(dt) * sx.astype(dt)
    co_shape = (1,) * (kq.ndim - 1) + (-1,)
    k_deq = kq.astype(dt) * sk.reshape(co_shape).astype(dt)
    g = g.astype(dt)

    # dx: conv with the spatially-flipped, (ci,co)-swapped kernel — exact for
    # stride 1 with "same"-style pad (kh-1-pad on each side restores it)
    kh, kw = k_deq.shape[0], k_deq.shape[1]
    k_flip = k_deq[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = _conv2d(g, k_flip, (kh - 1 - pad[0], kw - 1 - pad[1]), spec,
                 prefer=dt)

    # dk via jax.vjp of the plain conv at the dequantized point (one
    # transposed-conv HLO; these 3x3 small-channel kernel grads compile and
    # run fine — the pathological emitter was the 4D/3D case, conv4d.py)
    _, vjp = jax.vjp(lambda kk: _conv2d(x_deq, kk, pad, spec, prefer=dt),
                     k_deq)
    (dk,) = vjp(g)
    return dx.astype(dt), dk.astype(dt)


qconv2d.defvjp(_qconv2d_fwd, _qconv2d_bwd)
