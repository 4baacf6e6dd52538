"""Pallas TPU kernel: center-pivot 4D convolution on flat correlation volumes.

The NeighConsensus stack (reference: src/model/match.py:56-85 over
src/model/conv4d.py:11-62) filters (hq, wq, hs, ws) correlation volumes with
"center-pivot" 4D convs: a 3x3 conv over the query plane plus a 3x3 conv over
the support plane. Under XLA each pivot costs two whole-volume layout
operations (~0.5 GB each at the 473px protocol) around convs whose channel
count (1-10) wastes nearly the whole 128-lane MXU tile; the measured stack
forward is ~110 ms/episode and dominates MMN-head training
(tools/bench_head_parts.py).

This kernel computes one pivot pair directly on the natural layout of a
correlation volume — channels-major ``(C, Hq*Wq, Hs*Ws)``, which is exactly
what ``get_corr`` produces (no transposes anywhere in the pipeline):

* grid over hq rows; the hq+-1 halo comes from two extra index-clamped
  views of the input (Pallas's pipeline DMAs handle the non-128-aligned
  lane extent that a manual DMA slice may not);
* the query-plane conv is sublane rolls (wq) across the three resident hq
  rows; the support-plane conv is lane rolls by {-Ws-1 .. Ws+1}; hs/ws/wq
  zero-padding is two factored edge-mask families combined per tap;
* channel mixing is scalar-times-tile FMAs on the VPU (C<=10 makes the MXU
  strictly worse: a 128-lane tile would be >90% padding); the input-channel
  loop is a fori_loop (dynamic ring/weight indexing) to keep the Mosaic
  program small;
* bias and the stack's ReLU are fused into the epilogue;
* custom VJP: dx is THIS kernel applied to the relu-masked cotangent with
  spatially flipped, (ci,co)-transposed weights; dW/db accumulate into
  constant-index output blocks across the sequential grid.

``swap_roles`` (symmetric NeighConsensus) needs no kernel support: the caller
exchanges which weight convolves the query vs support planes.
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

# --------------------------------------------------------------------------- #
# kernel helpers
# --------------------------------------------------------------------------- #


def _edge_factors(wq: int, hs: int, ws: int):
    """Factored zero-padding masks for a (Wq, S) tile, S = hs*ws.

    Returns (row_m, hs_m, ws_m): row_m[dw] masks wq edges (query-plane conv);
    hs_m[ds] / ws_m[dt] multiply into the support-plane tap (ds, dt).
    """
    f32 = jnp.float32
    s = hs * ws
    w_pos = jax.lax.broadcasted_iota(jnp.int32, (wq, s), 0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (wq, s), 1)
    ws_pos = l_idx % ws
    hs_pos = l_idx // ws
    row_m = {dw: ((w_pos + dw >= 0) & (w_pos + dw < wq)).astype(f32)
             for dw in (-1, 1)}
    hs_m = {ds: ((hs_pos + ds >= 0) & (hs_pos + ds < hs)).astype(f32)
            for ds in (-1, 1)}
    ws_m = {dt: ((ws_pos + dt >= 0) & (ws_pos + dt < ws)).astype(f32)
            for dt in (-1, 1)}
    return row_m, hs_m, ws_m


def _roll_rows(x, dw):
    """shifted[w, l] = x[w+dw, l] with wrap (caller masks the wrap)."""
    if dw == 0:
        return x
    return pltpu.roll(x, (-dw) % x.shape[0], 0)


def _roll_lanes(x, off):
    """shifted[w, l] = x[w, l+off] with wrap (caller masks the wrap)."""
    if off == 0:
        return x
    return pltpu.roll(x, (-off) % x.shape[1], 1)


def _lane_tap(base, ds, dt, ws, hs_m, ws_m):
    """One support-plane tap: roll by ds*Ws+dt and zero the wrapped edges."""
    sh = _roll_lanes(base, ds * ws + dt)
    if ds != 0:
        sh = sh * hs_m[ds]
    if dt != 0:
        sh = sh * ws_m[dt]
    return sh


# --------------------------------------------------------------------------- #
# kernels
# --------------------------------------------------------------------------- #


def _pivot_fwd_kernel(ci: int, co_t: int, wq: int, hs: int, ws: int,
                      relu: bool,
                      xp_ref, xc_ref, xn_ref, wa_ref, wb_ref, bias_ref,
                      out_ref):
    """One hq row x one co tile of y = conv_q(x, wa) + conv_s(x, wb) + bias
    [+ relu].

    Grid is (hq rows,); the wrapper loops co tiles with SLICED weights —
    a co grid dimension would need a second dynamic leading index into the
    weight refs, which Mosaic miscompiled silently (tile 0 right, tile 1
    garbage; tools probe 2026-08-17). xp/xc/xn: (Ci, 1, Wq, S) blocks of
    rows i-1 / i / i+1 (index-clamped at the edges; the clamped aliases are
    zeroed by the scalar validity factor); wa/wb: (3, 3, Ci, co_t) whole;
    bias: (1, co_t); out block: (co_t, 1, Wq, S).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = jnp.float32
    row_m, hs_m, ws_m = _edge_factors(wq, hs, ws)

    up_ok = (i > 0).astype(f32)
    dn_ok = (i < n - 1).astype(f32)
    refs = {-1: (xp_ref, up_ok), 0: (xc_ref, 1.0), 1: (xn_ref, dn_ok)}

    def body(c_in, acc):
        # query-plane conv: rows i-1, i, i+1 of channel c_in
        for dh in (-1, 0, 1):
            ref, ok = refs[dh]
            base = ref[c_in, 0].astype(f32) * ok
            for dw in (-1, 0, 1):
                sh = _roll_rows(base, dw)
                if dw != 0:
                    sh = sh * row_m[dw]
                acc = tuple(
                    acc[c] + wa_ref[dh + 1, dw + 1, c_in, c] * sh
                    for c in range(co_t)
                )
        # support-plane conv: lane rolls on the current row
        cur = xc_ref[c_in, 0].astype(f32)
        for ds in (-1, 0, 1):
            for dt in (-1, 0, 1):
                sh = _lane_tap(cur, ds, dt, ws, hs_m, ws_m)
                acc = tuple(
                    acc[c] + wb_ref[ds + 1, dt + 1, c_in, c] * sh
                    for c in range(co_t)
                )
        return acc

    acc0 = tuple(jnp.full((wq, hs * ws), bias_ref[0, c], f32)
                 for c in range(co_t))
    # fori (not a static unroll): unrolling keeps every shifted tile live —
    # measured 238 MB of VMEM at ci=10 — while the loop form fits via spills
    acc = jax.lax.fori_loop(0, ci, body, acc0)

    for c in range(co_t):
        v = jnp.maximum(acc[c], 0.0) if relu else acc[c]
        out_ref[c, 0] = v.astype(out_ref.dtype)


def _pivot_dw_kernel(ci: int, co_t: int, wq: int, hs: int, ws: int,
                     xp_ref, xc_ref, xn_ref, g_ref,
                     dwa_ref, dwb_ref, db_ref):
    """Weight/bias grads: dwa[dh,dw,ci,co] = sum_pos x[ci, pos+d] * g[co, pos].

    Grid is (hq rows,); the wrapper loops co tiles with a sliced cotangent.
    Output blocks — (Ci, 3, 3, co_t) / (1, co_t), laid out so the dynamic
    fori channel index lands on the untiled leading dim — have constant
    index maps: they stay resident in VMEM across the whole sweep and
    accumulate (zeroed at row 0). g_ref: (co_t, 1, Wq, S) cotangent row.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = jnp.float32
    row_m, hs_m, ws_m = _edge_factors(wq, hs, ws)

    @pl.when(i == 0)
    def _zero():
        # SMEM allows scalar stores only — zero element-wise (once, row 0)
        for c_in in range(ci):
            for a in range(3):
                for b in range(3):
                    for c in range(co_t):
                        dwa_ref[c_in, a, b, c] = 0.0
                        dwb_ref[c_in, a, b, c] = 0.0
        for c in range(co_t):
            db_ref[0, c] = 0.0

    g = tuple(g_ref[c, 0].astype(f32) for c in range(co_t))
    for c in range(co_t):
        db_ref[0, c] += jnp.sum(g[c])

    up_ok = (i > 0).astype(f32)
    dn_ok = (i < n - 1).astype(f32)
    refs = {-1: (xp_ref, up_ok), 0: (xc_ref, 1.0), 1: (xn_ref, dn_ok)}

    def body(c_in, carry):
        for dh in (-1, 0, 1):
            ref, ok = refs[dh]
            base = ref[c_in, 0].astype(f32) * ok
            for dw in (-1, 0, 1):
                sh = _roll_rows(base, dw)
                if dw != 0:
                    sh = sh * row_m[dw]
                for c in range(co_t):
                    dwa_ref[c_in, dh + 1, dw + 1, c] += jnp.sum(sh * g[c])
        cur = xc_ref[c_in, 0].astype(f32)
        for ds in (-1, 0, 1):
            for dt in (-1, 0, 1):
                sh = _lane_tap(cur, ds, dt, ws, hs_m, ws_m)
                for c in range(co_t):
                    dwb_ref[c_in, ds + 1, dt + 1, c] += jnp.sum(sh * g[c])
        return carry

    jax.lax.fori_loop(0, ci, body, 0)


# --------------------------------------------------------------------------- #
# pallas_call wrappers
# --------------------------------------------------------------------------- #


def _vmem_raw(ci: int, co_t: int, wq: int, s: int) -> int:
    """Raw VMEM footprint model for one kernel instance (co_t = co tile)."""
    tile = wq * s * 4
    return (
        2 * 3 * ci * tile            # double-buffered prev/cur/next blocks
        + 2 * co_t * tile            # double-buffered output block
        + 2 * co_t * tile            # accumulator tuple + epilogue copies
        + 10 * tile                  # masks, iota temps, shift transients
        + 4 * 1024 * 1024
    )


def _vmem_need(ci: int, co_t: int, wq: int, s: int) -> int:
    """Grant: raw model x1.4 slack for Mosaic's scheduling transients
    (calibrated: 127.3M actual at a 99M raw model, ci=co=10 @ 60^4)."""
    return min(127 * 1024 * 1024, int(_vmem_raw(ci, co_t, wq, s) * 1.4))


def _pick_co_tile(ci: int, co: int, wq: int, s: int) -> int:
    """Largest divisor of co whose modeled footprint leaves Mosaic headroom
    (measured: a 99M raw model produced a 127.3M actual stack need — cap the
    raw model at 85M so the actual lands safely under the 127M limit).
    FSS_PIVOT_COT forces a tile size (tests exercise the nco > 1 path)."""
    import os

    forced = os.environ.get("FSS_PIVOT_COT")
    if forced:  # largest DIVISOR of co that is <= the forced size
        want = min(int(forced), co)
        return max(t for t in range(1, want + 1) if co % t == 0)
    for co_t in range(co, 0, -1):
        if co % co_t == 0 and _vmem_raw(ci, co_t, wq, s) <= 85 * 1024 * 1024:
            return co_t
    return 1


def _row_specs(c: int, hq: int, wq: int, s: int):
    """Three (C, 1, Wq, S) views of a (C, Hq, Wq, S) array: rows hq-1, hq,
    hq+1, index-clamped at the edges (the kernel masks the aliased rows)."""
    blk = (c, 1, wq, s)
    return [
        pl.BlockSpec(blk, lambda i: (0, jnp.maximum(i - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda i: (0, jnp.minimum(i + 1, hq - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _pivot_call(kernel, grid, in_specs, out_specs, out_shape, ci, co_t, wq, s,
                hq, interpret, extra_flops=0):
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_need(ci, co_t, wq, s),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 18 * ci * co_t * hq * wq * s + extra_flops,
            bytes_accessed=(3 * ci + co_t) * hq * wq * s * 4,
            transcendentals=0,
        ),
    )


@functools.partial(jax.jit, static_argnames=("dims", "relu", "interpret"))
def _pivot_fwd(x, wa, wb, bias, dims: Tuple[int, int, int, int],
               relu: bool, interpret: bool):
    hq, wq, hs, ws = dims
    ci = x.shape[0]
    co = wa.shape[-1]
    s = hs * ws
    x4 = x.reshape(ci, hq, wq, s).astype(jnp.float32)
    co_t = _pick_co_tile(ci, co, wq, s)
    nco = co // co_t
    kern = functools.partial(_pivot_fwd_kernel, ci, co_t, wq, hs, ws, relu)
    call = _pivot_call(
        kern, (hq,),
        in_specs=_row_specs(ci, hq, wq, s) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),      # wa tile (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # wb tile (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias tile (whole)
        ],
        out_specs=pl.BlockSpec((co_t, 1, wq, s), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co_t, hq, wq, s), jnp.float32),
        ci=ci, co_t=co_t, wq=wq, s=s, hq=hq, interpret=interpret,
    )
    f32 = jnp.float32
    tiles = [
        call(x4, x4, x4,
             wa[..., t * co_t:(t + 1) * co_t].astype(f32),
             wb[..., t * co_t:(t + 1) * co_t].astype(f32),
             bias[t * co_t:(t + 1) * co_t].reshape(1, co_t).astype(f32))
        for t in range(nco)
    ]
    out = tiles[0] if nco == 1 else jnp.concatenate(tiles, axis=0)
    # mirror nn.Conv/_promote semantics: bf16 x with f32 weights must come
    # out f32 like the XLA 6D path, not truncate to the input dtype
    return out.reshape(co, hq * wq, s).astype(
        jnp.promote_types(x.dtype, wa.dtype))


@functools.partial(jax.jit, static_argnames=("co", "dims", "interpret"))
def _pivot_dw(x, g, co: int, dims: Tuple[int, int, int, int],
              interpret: bool):
    hq, wq, hs, ws = dims
    ci = x.shape[0]
    s = hs * ws
    x4 = x.reshape(ci, hq, wq, s).astype(jnp.float32)
    g4 = g.reshape(co, hq, wq, s).astype(jnp.float32)
    co_t = _pick_co_tile(ci, co, wq, s)
    nco = co // co_t
    kern = functools.partial(_pivot_dw_kernel, ci, co_t, wq, hs, ws)
    # dW accumulates SCALAR reduction results — scalar stores are legal in
    # SMEM only ("Cannot store scalars to VMEM", Mosaic swap lowering)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.SMEM)
    call = _pivot_call(
        kern, (hq,),
        in_specs=_row_specs(ci, hq, wq, s) + [
            pl.BlockSpec((co_t, 1, wq, s), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),      # g row
        ],
        out_specs=(const_spec((ci, 3, 3, co_t)), const_spec((ci, 3, 3, co_t)),
                   const_spec((1, co_t))),
        out_shape=(
            jax.ShapeDtypeStruct((ci, 3, 3, co_t), jnp.float32),
            jax.ShapeDtypeStruct((ci, 3, 3, co_t), jnp.float32),
            jax.ShapeDtypeStruct((1, co_t), jnp.float32),
        ),
        ci=ci, co_t=co_t, wq=wq, s=s, hq=hq, interpret=interpret,
    )
    parts = [call(x4, x4, x4, g4[t * co_t:(t + 1) * co_t])
             for t in range(nco)]
    dwa = jnp.concatenate([p[0] for p in parts], axis=-1)
    dwb = jnp.concatenate([p[1] for p in parts], axis=-1)
    db = jnp.concatenate([p[2] for p in parts], axis=-1)
    # (ci, 3, 3, co) -> (3, 3, ci, co)
    return (dwa.transpose(1, 2, 0, 3), dwb.transpose(1, 2, 0, 3),
            db.reshape(co))


def _flip_t(w: jnp.ndarray) -> jnp.ndarray:
    """Spatially flipped, (ci, co)-transposed kernel: the conv whose forward
    is this kernel's VJP wrt x."""
    return w[::-1, ::-1].transpose(0, 1, 3, 2)


# --------------------------------------------------------------------------- #
# differentiable op
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def _pivot_op(dims: Tuple[int, int, int, int], relu: bool, interpret: bool):
    """Differentiable pivot pair for fixed static config.

    Signature: f(x (Ci, Q, S), wa (3,3,Ci,Co), wb, bias (Co,)) -> (Co, Q, S).
    wa convolves the query plane, wb the support plane; a symmetric chain's
    swapped orientation passes (ws_kernel, wq_kernel).
    """

    @jax.custom_vjp
    def op(x, wa, wb, bias):
        return _pivot_fwd(x, wa, wb, bias, dims, relu, interpret)

    def fwd(x, wa, wb, bias):
        y = op(x, wa, wb, bias)
        return y, (x, wa, wb, bias, y)

    def bwd(res, dy):
        x, wa, wb, bias, y = res
        g = dy * (y > 0).astype(dy.dtype) if relu else dy
        zeros = jnp.zeros((x.shape[0],), jnp.float32)
        dx = _pivot_fwd(g, _flip_t(wa), _flip_t(wb), zeros, dims,
                        False, interpret)
        dwa, dwb, db = _pivot_dw(x, g, wa.shape[-1], dims, interpret)
        # every cotangent must match its primal's dtype (bias may be bf16
        # under use_amp)
        return (dx.astype(x.dtype), dwa.astype(wa.dtype),
                dwb.astype(wb.dtype), db.astype(bias.dtype))

    op.defvjp(fwd, bwd)
    return op


def pivot_conv_flat(x: jnp.ndarray, wa: jnp.ndarray, wb: jnp.ndarray,
                    bias: jnp.ndarray,
                    dims: Tuple[int, int, int, int],
                    relu: bool = False,
                    interpret: bool = False) -> jnp.ndarray:
    """Center-pivot conv pair on a flat volume.

    x: (B, Ci, Q, S) with Q = hq*wq, S = hs*ws (dims = (hq, wq, hs, ws));
    wa/wb: (3, 3, Ci, Co) query-/support-plane kernels; bias: (Co,).
    Returns (B, Co, Q, S). Differentiable (custom VJP, Pallas throughout).
    """
    op = _pivot_op(tuple(int(d) for d in dims), bool(relu), bool(interpret))
    if x.shape[0] == 1:  # common case: one episode volume, no batching rule
        return op(x[0], wa, wb, bias)[None]
    return jax.lax.map(lambda xe: op(xe, wa, wb, bias), x)


def pivot_kernel_available(kernel_size, stride, padding) -> bool:
    """Structural dispatch gate (the caller also checks the backend)."""
    import os

    if os.environ.get("FSS_DISABLE_PALLAS") == "1":
        return False
    if not HAVE_PALLAS:
        return False
    return (tuple(kernel_size) == (3, 3, 3, 3)
            and tuple(stride) == (1, 1, 1, 1)
            and tuple(padding) == (1, 1, 1, 1))


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def pivot_impl():
    """Which Pallas pivot formulation is enabled for this process.

    Returns "mxu", "vpu", or None:

    * "mxu" — the dot-form kernel (ops/pallas_pivot_mxu.py): taps*Ci on the
      MXU contraction dim, support positions on the lanes. Exact on-chip
      (1.9e-7 vs XLA) but REFUTED as a win: 39.8 ms/pivot fwd vs XLA's
      ~25 ms bare / 49.9 ms flat-route, and 2.32 vs 2.90 eps/s on the full
      MMN train step — both implementations sit at the im2col INGEST floor
      (every volume element enters the MXU once per tap; ~28 ms at f32),
      and the custom VJP rebuilds the im2col twice. Opt-in via
      FSS_PIVOT_MXU=1 (BENCH.md round 4 "MXU pivot refutation").
    * "vpu" — the round-3 scalar-FMA kernel, opt-in via FSS_PIVOT_PALLAS=1;
      exact and HBM-optimal but measured VPU-issue-bound on v5e (67 ms,
      BENCH.md "Pivot kernel refutation") — kept as the integration point
      if a future Mosaic/part changes the calculus.
    * None — XLA 6D math.

    FSS_PIVOT_INTERPRET=1 forces the interpreter path (CPU tests) for
    whichever formulation is selected (mxu unless FSS_PIVOT_PALLAS=1).
    """
    import os

    if not HAVE_PALLAS or os.environ.get("FSS_DISABLE_PALLAS") == "1":
        return None
    interpret = os.environ.get("FSS_PIVOT_INTERPRET") == "1"
    if os.environ.get("FSS_PIVOT_PALLAS") == "1":
        return "vpu" if (on_tpu() or interpret) else None
    if os.environ.get("FSS_PIVOT_MXU") == "1" and (on_tpu() or interpret):
        return "mxu"
    if interpret:  # interpret-only: exercise the primary (mxu) formulation
        return "mxu"
    return None


def pivot_pallas_active(kernel_sizes=None) -> bool:
    """Is a Pallas pivot path enabled for this process?

    Shares the availability gates with pivot_kernel_available so the
    stack-level and per-block dispatch decisions can never disagree (a
    disagreement would interleave flat and 6D stages, the HBM-peak pattern
    run_match_model_flat exists to avoid). ``kernel_sizes`` (one per
    NeighConsensus block) makes the gate structural too: a non-default
    config (e.g. 5x5 blocks) whose per-block dispatch would fall back to 6D
    math disables the flat route up front, so flat and 6D stages can never
    interleave.
    """
    if kernel_sizes is not None and not all(
        pivot_kernel_available((k,) * 4, (1,) * 4, (k // 2,) * 4)
        for k in kernel_sizes
    ):
        return False
    return pivot_impl() is not None
