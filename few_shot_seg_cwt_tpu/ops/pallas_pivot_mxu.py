"""Pallas TPU kernel: MXU (dot-form) center-pivot 4D convolution.

Second formulation of the NeighConsensus pivot pair (reference:
src/model/match.py:56-85 over src/model/conv4d.py:27-38), built after the
round-3 VPU formulation (ops/pallas_pivot.py) was measured issue-bound at
67 ms vs XLA's ~25 ms for one 10->10 pivot at the 473px protocol.

Why a dot form can win where both XLA and the VPU form lose:

* XLA lowers each plane conv as im2col x weights with the OUTPUT CHANNELS on
  the MXU's 128-lane tile — Co<=10 wastes >92% of every pass (plus two
  whole-volume transposes per pivot). Measured ~25 ms/pivot, ~1-2% MFU.
* The VPU form eliminates the transposes but pays 18*Ci*Co scalar-times-tile
  FMAs per tile — pure vector-issue cost that no memory optimality recovers.
* This kernel contracts taps*Ci (18*Ci = 180 at the protocol's 10->10
  blocks) as the MXU's K dim and puts the 3600 SUPPORT POSITIONS on the
  lanes, where they tile perfectly: Y[co, s] = sum_k Wflat[co, k] * A[k, s].
  The im2col block A for one (hq row, wq) is built entirely in VMEM from
  the same three resident hq-row views the VPU kernel streams (query-plane
  taps are static sublane slices, support-plane taps are lane rolls), so
  HBM traffic stays at the VPU kernel's optimal 3 reads + 1 write per
  volume element and the whole-volume transposes never exist.

Same contract as ops/pallas_pivot.pivot_conv_flat: channels-major flat
volume (B, Ci, Hq*Wq, Hs*Ws), query-plane weights wa, support-plane wb,
fused bias/ReLU, full custom VJP (dx by the same kernel with flipped
weights; dW as an NT-dot against the rebuilt im2col; db fused there too).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas import is safe everywhere; execution is TPU-only
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _dot_precision():
    """f32 MXU passes: HIGHEST by default for parity with XLA's f32 convs;
    FSS_PIVOT_MXU_PREC=default opts into faster, lower-precision passes."""
    import os

    if os.environ.get("FSS_PIVOT_MXU_PREC", "highest") == "default":
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _support_masks(ci: int, hs: int, ws: int):
    """(Ci, S) lane-edge masks for the support-plane taps."""
    f32 = jnp.float32
    s = hs * ws
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (ci, s), 1)
    ws_pos = l_idx % ws
    hs_pos = l_idx // ws
    hs_m = {d: ((hs_pos + d >= 0) & (hs_pos + d < hs)).astype(f32)
            for d in (-1, 1)}
    ws_m = {d: ((ws_pos + d >= 0) & (ws_pos + d < ws)).astype(f32)
            for d in (-1, 1)}
    return hs_m, ws_m


def _fill_im2col(a_ref, refs, ci: int, wq_i, wq: int, ws: int,
                 hs_m, ws_m) -> None:
    """Store the 18 (Ci, S) tap rows for query position (grid row, wq_i)
    into the im2col scratch a_ref (18*Ci, S).

    Row order matches _flatten_weights: 9 query taps (dh outer, dw inner)
    then 9 support taps (ds outer, dt inner); each row is one full input
    channel set, so A row index = tap*Ci + ci. Rows go through VMEM stores
    (not jnp.concatenate): Mosaic's concatenate requires matching internal
    vector offsets, which rolled/sliced taps do not have. ``wq_i`` is a
    TRACED index (the caller loops wq with fori_loop — a static 60-way
    unroll produced a Mosaic program that compiled for >20 minutes); the
    wq edges are masked by a scalar validity factor instead of branches.
    """
    f32 = jnp.float32
    t = 0
    for dh in (-1, 0, 1):
        ref, ok = refs[dh]
        for dw in (-1, 0, 1):
            j = wq_i + dw
            jc = jnp.clip(j, 0, wq - 1)
            v = ok * jnp.where((j >= 0) & (j < wq), f32(1), f32(0))
            a_ref[t * ci:(t + 1) * ci, :] = (
                ref[:, 0, jc, :].astype(f32) * v)
            t += 1
    cur = refs[0][0][:, 0, wq_i, :].astype(f32)
    for ds in (-1, 0, 1):
        for dt in (-1, 0, 1):
            off = ds * ws + dt
            sh = cur if off == 0 else pltpu.roll(cur, (-off) % cur.shape[1], 1)
            if ds != 0:
                sh = sh * hs_m[ds]
            if dt != 0:
                sh = sh * ws_m[dt]
            a_ref[t * ci:(t + 1) * ci, :] = sh
            t += 1


def _mxu_fwd_kernel(ci: int, co: int, wq: int, hs: int, ws: int, relu: bool,
                    xp_ref, xc_ref, xn_ref, wflat_ref, bias_ref, out_ref,
                    a_ref):
    """One hq row of Y = Wflat @ im2col(x) + bias [+ relu].

    xp/xc/xn: (Ci, 1, Wq, S) views of rows i-1 / i / i+1 (index-clamped at
    the edges; the aliased rows are zeroed by the scalar validity factors);
    wflat: (Co, 18*Ci); bias: (Co, 1); out: (Co, 1, Wq, S). The wq loop is
    a static unroll: every tap is a static sublane slice or a lane roll —
    no dynamic VMEM indexing anywhere (Mosaic miscompiled two-level dynamic
    indexing silently in the round-3 probes, so this kernel has none).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = jnp.float32
    hs_m, ws_m = _support_masks(ci, hs, ws)

    up_ok = (i > 0).astype(f32)
    dn_ok = (i < n - 1).astype(f32)
    refs = {-1: (xp_ref, up_ok), 0: (xc_ref, 1.0), 1: (xn_ref, dn_ok)}

    w = wflat_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)                     # (Co, 1)
    prec = _dot_precision()

    def body(wq_i, carry):
        _fill_im2col(a_ref, refs, ci, wq_i, wq, ws, hs_m, ws_m)
        y = jax.lax.dot_general(
            w, a_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        ) + bias                                       # (Co, S)
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:, 0, wq_i, :] = y.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, wq, body, 0)


def _mxu_dw_kernel(ci: int, co: int, wq: int, hs: int, ws: int,
                   xp_ref, xc_ref, xn_ref, g_ref, dw_ref, db_ref, a_ref):
    """Weight/bias grads: dWflat[co, k] = sum_pos A[k, pos] * g[co, pos].

    Rebuilds the same im2col rows as the forward and contracts them against
    the cotangent row with an NT dot (contraction over the S lanes — both
    operands carry positions on lanes, so nothing is transposed). The
    (Co, 18*Ci) / (Co, 1) outputs have constant index maps: they stay
    resident in VMEM across the whole row sweep and accumulate (zeroed at
    row 0) — vector stores, unlike the VPU dw kernel's scalar-in-SMEM form.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = jnp.float32
    hs_m, ws_m = _support_masks(ci, hs, ws)

    @pl.when(i == 0)
    def _zero():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)

    up_ok = (i > 0).astype(f32)
    dn_ok = (i < n - 1).astype(f32)
    refs = {-1: (xp_ref, up_ok), 0: (xc_ref, 1.0), 1: (xn_ref, dn_ok)}

    prec = _dot_precision()

    def body(wq_i, accs):
        dw_acc, db_acc = accs
        _fill_im2col(a_ref, refs, ci, wq_i, wq, ws, hs_m, ws_m)
        g = g_ref[:, 0, wq_i, :].astype(f32)           # (Co, S)
        dw_acc = dw_acc + jax.lax.dot_general(
            g, a_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )                                              # (Co, 18*Ci)
        db_acc = db_acc + jnp.sum(g, axis=1, keepdims=True)
        return dw_acc, db_acc

    dw_acc, db_acc = jax.lax.fori_loop(
        0, wq, body, (jnp.zeros(dw_ref.shape, f32),
                      jnp.zeros(db_ref.shape, f32)))
    dw_ref[:, :] += dw_acc
    db_ref[:, :] += db_acc


# --------------------------------------------------------------------------- #
# pallas_call wrappers
# --------------------------------------------------------------------------- #


def _row_specs(c: int, hq: int, wq: int, s: int):
    blk = (c, 1, wq, s)
    return [
        pl.BlockSpec(blk, lambda i: (0, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda i: (0, jnp.minimum(i + 1, hq - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _pad_sub(x: int, m: int = 8) -> int:
    return -(-x // m) * m


def _pad_lane(x: int, m: int = 128) -> int:
    return -(-x // m) * m


def _vmem_need(ci: int, co: int, wq: int, s: int) -> int:
    """Padded-footprint model: 3 double-buffered row views + out block +
    two live im2col transients + masks/roll temps, x1.3 Mosaic slack."""
    row = ci * _pad_sub(wq) * _pad_lane(s) * 4
    out = _pad_sub(co) * _pad_sub(wq) * _pad_lane(s) * 4
    a = _pad_sub(18 * ci) * _pad_lane(s) * 4
    raw = 2 * 3 * row + 2 * out + 3 * a + 8 * _pad_sub(ci) * _pad_lane(s) * 4
    return min(127 * 1024 * 1024, int(raw * 1.3) + 2 * 1024 * 1024)


def _flatten_weights(wa: jnp.ndarray, wb: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) x2 -> (Co, 18*Ci), rows ordered (tap, ci) to match
    _im2col_taps (query taps dh-major then support taps ds-major)."""
    ci, co = wa.shape[2], wa.shape[3]
    return jnp.concatenate(
        [wa.reshape(9 * ci, co), wb.reshape(9 * ci, co)], axis=0
    ).T.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("dims", "relu", "interpret"))
def _mxu_fwd(x, wa, wb, bias, dims: Tuple[int, int, int, int],
             relu: bool, interpret: bool):
    hq, wq, hs, ws = dims
    ci = x.shape[0]
    co = wa.shape[-1]
    s = hs * ws
    x4 = x.reshape(ci, hq, wq, s).astype(jnp.float32)
    wflat = _flatten_weights(wa, wb)
    kern = functools.partial(_mxu_fwd_kernel, ci, co, wq, hs, ws, relu)
    out = pl.pallas_call(
        kern,
        grid=(hq,),
        in_specs=_row_specs(ci, hq, wq, s) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),      # wflat (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias (Co, 1) whole
        ],
        out_specs=pl.BlockSpec((co, 1, wq, s), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, hq, wq, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((18 * ci, s), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_need(ci, co, wq, s),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 18 * ci * co * hq * wq * s,
            bytes_accessed=(3 * ci + co) * hq * wq * s * 4,
            transcendentals=0,
        ),
    )(x4, x4, x4, wflat, bias.reshape(co, 1).astype(jnp.float32))
    return out.reshape(co, hq * wq, s).astype(
        jnp.promote_types(x.dtype, wa.dtype))


@functools.partial(jax.jit, static_argnames=("co", "dims", "interpret"))
def _mxu_dw(x, g, co: int, dims: Tuple[int, int, int, int], interpret: bool):
    hq, wq, hs, ws = dims
    ci = x.shape[0]
    s = hs * ws
    x4 = x.reshape(ci, hq, wq, s).astype(jnp.float32)
    g4 = g.reshape(co, hq, wq, s).astype(jnp.float32)
    kern = functools.partial(_mxu_dw_kernel, ci, co, wq, hs, ws)
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    dwflat, db = pl.pallas_call(
        kern,
        grid=(hq,),
        in_specs=_row_specs(ci, hq, wq, s) + [
            pl.BlockSpec((co, 1, wq, s), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),      # cotangent row
        ],
        out_specs=(const2((co, 18 * ci)), const2((co, 1))),
        out_shape=(
            jax.ShapeDtypeStruct((co, 18 * ci), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((18 * ci, s), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_need(ci, co, wq, s),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 18 * ci * co * hq * wq * s,
            bytes_accessed=(3 * ci + co) * hq * wq * s * 4,
            transcendentals=0,
        ),
    )(x4, x4, x4, g4)
    # (Co, 18*Ci) -> wa rows then wb rows, each (9*Ci, Co) -> (3, 3, Ci, Co)
    dwa = dwflat[:, : 9 * ci].T.reshape(3, 3, ci, co)
    dwb = dwflat[:, 9 * ci:].T.reshape(3, 3, ci, co)
    return dwa, dwb, db.reshape(co)


def _flip_t(w: jnp.ndarray) -> jnp.ndarray:
    return w[::-1, ::-1].transpose(0, 1, 3, 2)


@functools.lru_cache(maxsize=None)
def _mxu_op(dims: Tuple[int, int, int, int], relu: bool, interpret: bool):
    """Differentiable MXU pivot pair for a fixed static config (same
    signature as pallas_pivot._pivot_op)."""

    @jax.custom_vjp
    def op(x, wa, wb, bias):
        return _mxu_fwd(x, wa, wb, bias, dims, relu, interpret)

    def fwd(x, wa, wb, bias):
        y = op(x, wa, wb, bias)
        return y, (x, wa, wb, bias, y)

    def bwd(res, dy):
        x, wa, wb, bias, y = res
        g = dy * (y > 0).astype(dy.dtype) if relu else dy
        zeros = jnp.zeros((x.shape[0],), jnp.float32)
        dx = _mxu_fwd(g, _flip_t(wa), _flip_t(wb), zeros, dims,
                      False, interpret)
        dwa, dwb, db = _mxu_dw(x, g, wa.shape[-1], dims, interpret)
        return (dx.astype(x.dtype), dwa.astype(wa.dtype),
                dwb.astype(wb.dtype), db.astype(bias.dtype))

    op.defvjp(fwd, bwd)
    return op


def pivot_conv_flat_mxu(x: jnp.ndarray, wa: jnp.ndarray, wb: jnp.ndarray,
                        bias: jnp.ndarray,
                        dims: Tuple[int, int, int, int],
                        relu: bool = False,
                        interpret: bool = False) -> jnp.ndarray:
    """MXU-form center-pivot conv pair on a flat volume.

    Same contract as pallas_pivot.pivot_conv_flat: x (B, Ci, Q, S) with
    Q = hq*wq, S = hs*ws; wa/wb (3, 3, Ci, Co); bias (Co,); returns
    (B, Co, Q, S) in the promoted dtype. Differentiable (custom VJP).
    """
    op = _mxu_op(tuple(int(d) for d in dims), bool(relu), bool(interpret))
    if x.shape[0] == 1:
        return op(x[0], wa, wb, bias)[None]
    return jax.lax.map(lambda xe: op(xe, wa, wb, bias), x)
