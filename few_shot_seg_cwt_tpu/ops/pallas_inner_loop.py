"""Pallas TPU kernel: the whole 200-step inner loop, VMEM-resident.

The closed-form binary inner loop (episodic.inner_loop._adapt_binary) is a
200-iteration chain of small matmuls over fixed operands: the support
features (3600 x 512), the two interpolation matrices (473 x 60), and the
per-pixel weight/target maps. Under XLA each step round-trips its 473x473
intermediates through HBM; this kernel pins every operand in VMEM (~11 MB
for 1-shot) and runs all steps inside one `fori_loop`, so after the initial
load the loop does zero HBM traffic.

The kernel is written per-episode; `jax.vmap` lifts it over the episode batch
(pallas_call carries a batching rule that prepends a grid dimension). It
falls back to the XLA scan for multi-shot episodes whose features exceed the
VMEM budget (dispatch in episodic.inner_loop).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resize import interp_matrix_align_corners

try:  # pallas import is safe everywhere; execution is TPU-only
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _kernel(num_steps: int, lr: float, shot: int,
            fs_ref, a_ref, b_ref, pws_ref, u0_ref, acc_ref):
    """Evolve the chunked (n_chunks, chunk) gradient accumulator in VMEM.

    The feature block arrives pre-chunked along the leading axis —
    (shot * n_chunks, h, w, chunk) — because Mosaic supports neither
    lane-axis slicing at non-zero offsets nor (hw, 1) <-> (h, w) relayouts.
    Channel contractions are VPU broadcast-multiply + reductions per chunk;
    the spatial up/downsample chain runs on the MXU as plain 2D matmuls.
    Pixel weights are sign-packed (pws = pw * (1 - 2y)) into one (shot, H, W)
    buffer; the shot loop is statically unrolled and accumulates per-shot
    gradient contributions (the weighted-CE mean is already folded into pw).
    """
    a = a_ref[:]             # (H, h)
    b = b_ref[:]             # (W, w)
    u0 = u0_ref[:]           # (n_chunks, chunk)
    n_chunks = u0.shape[0]
    scale = 2.0 * lr

    def shot_grad(sidx, u):
        """One shot's (n_chunks, chunk) gradient contribution."""
        d60 = jnp.zeros((a.shape[1], b.shape[1]), jnp.float32)
        for k in range(n_chunks):                                    # static
            blk = fs_ref[sidx * n_chunks + k]
            d60 += jnp.sum(blk * u[k][None, None, :], axis=-1)       # VPU
        d473 = jnp.dot(
            jnp.dot(a, d60, preferred_element_type=jnp.float32),
            b.T, preferred_element_type=jnp.float32,
        )                                                            # (H, W)
        # g = pw*(sigmoid(d) - y) with pws = pw*(1-2y):
        #   g = |pws|*(sigmoid(d) - 0.5) + 0.5*pws
        pws = pws_ref[sidx]
        g = jnp.abs(pws) * (jax.nn.sigmoid(d473) - 0.5) + 0.5 * pws
        g60 = jnp.dot(
            jnp.dot(a.T, g, preferred_element_type=jnp.float32),
            b, preferred_element_type=jnp.float32,
        )                                                            # (h, w)
        gu = [
            jnp.sum(fs_ref[sidx * n_chunks + k] * g60[:, :, None],
                    axis=(0, 1))                                      # (chunk,)
            for k in range(n_chunks)
        ]
        return jnp.stack(gu, axis=0)

    def step(_, acc):
        u = u0 - scale * acc                                         # (n, chunk)
        if shot == 1:
            # keep the 1-shot hot path free of loop machinery
            return acc + shot_grad(0, u)
        # multi-shot: a fori_loop (dynamic ref indexing) instead of a static
        # unroll, so Mosaic reuses ONE shot's worth of (H, W) transients —
        # the static unroll kept ~8 live pixel maps PER shot and dominated
        # the multi-shot VMEM budget
        return jax.lax.fori_loop(
            0, shot, lambda s, tot: tot + shot_grad(s, u), acc
        )

    acc_ref[:] = jax.lax.fori_loop(0, num_steps, step, jnp.zeros_like(u0))


def _tiled_kernel(num_steps: int, lr: float, tile: int, n_chunks: int,
                  fs_ref, a_ref, b_ref, pws_ref, u0_ref, acc_ref):
    """1-shot kernel instance evolving TILE episodes' accumulators jointly.

    The per-episode gradient chains are data-independent; unrolling ``tile``
    of them per step lets Mosaic interleave their MXU/VPU ops, hiding the
    serial op latency that dominates the single-episode kernel (measured
    ~6.8 us/step vs ~3 us of raw compute at 1-shot @473 — each step is a
    dependent chain of ~8 small ops). Refs are indexed at STATIC leading-axis
    offsets only (Mosaic allows no lane slicing / value dynamic_slice).
    """
    a = a_ref[:]                 # (H, h)
    b = b_ref[:]                 # (W, w)
    u0 = u0_ref[:]               # (tile*n_chunks, chunk)
    scale = 2.0 * lr

    def episode_grad(e, u):
        d60 = jnp.zeros((a.shape[1], b.shape[1]), jnp.float32)
        for k in range(n_chunks):                                    # static
            blk = fs_ref[e * n_chunks + k]
            d60 += jnp.sum(blk * u[e * n_chunks + k][None, None, :], axis=-1)
        d473 = jnp.dot(
            jnp.dot(a, d60, preferred_element_type=jnp.float32),
            b.T, preferred_element_type=jnp.float32,
        )
        pws = pws_ref[e]
        g = jnp.abs(pws) * (jax.nn.sigmoid(d473) - 0.5) + 0.5 * pws
        g60 = jnp.dot(
            jnp.dot(a.T, g, preferred_element_type=jnp.float32),
            b, preferred_element_type=jnp.float32,
        )
        gu = [jnp.sum(fs_ref[e * n_chunks + k] * g60[:, :, None], axis=(0, 1))
              for k in range(n_chunks)]
        return jnp.stack(gu, axis=0)                                 # (n_chunks, chunk)

    def step(_, acc):
        u = u0 - scale * acc
        grads = [episode_grad(e, u) for e in range(tile)]            # independent
        return acc + jnp.concatenate(grads, axis=0)

    acc_ref[:] = jax.lax.fori_loop(0, num_steps, step, jnp.zeros_like(u0))


def _vmem_need_tiled(tile: int, h: int, w: int, c: int,
                     big_h: int, big_w: int) -> int:
    """VMEM model for the tiled 1-shot kernel: per-episode operands scale by
    tile, the interpolation matrices are shared, and the interleaved chains
    keep each episode's (H, W) transients live simultaneously."""
    return (
        4 * 2 * (
            tile * h * w * c               # f_s tiles
            + tile * big_h * big_w         # sign-packed pixel weights
            + big_h * h + big_w * w        # A, B (shared)
        )
        + 4 * (3 * big_h * big_w + h * w * 128)   # fixed scratch
        + tile * 8 * big_h * big_w * 4            # interleaved transients
        + 4 * 1024 * 1024                         # safety margin
    )


def _pick_tile(axis_size: int, shot: int, h: int, w: int, c: int,
               big_h: int, big_w: int) -> int:
    """Default 1: the tile=4 experiment measured 98.7 vs 100.3 eps/s at the
    473px protocol — Mosaic does not interleave the independent chains
    enough to beat the per-episode kernel's smaller VMEM footprint
    (BENCH.md round 3). FSS_INNER_TILE=2|4 re-enables the tiled kernel for
    future experiments; it remains interpret-mode parity-tested."""
    import os

    want = int(os.environ.get("FSS_INNER_TILE", "1"))
    if shot != 1 or want <= 1:
        return 1
    for t in (want, 2):
        if t > 1 and axis_size % t == 0 and _vmem_need_tiled(
                t, h, w, c, big_h, big_w) < 127 * 1024 * 1024:
            return t
    return 1


@functools.partial(jax.jit,
                   static_argnames=("num_steps", "lr", "tile", "interpret"))
def adapt_binary_pallas_tiled(
    f_s: jnp.ndarray,        # (E, 1, h, w, C) support features
    pw: jnp.ndarray,         # (E, 1, H, W) normalized pixel weights
    pwy: jnp.ndarray,        # (E, 1, H, W) pw * y
    u0: jnp.ndarray,         # (E, C) initial row differences
    num_steps: int,
    lr: float,
    tile: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Episode-batched 1-shot inner loop, ``tile`` episodes per kernel
    instance (E % tile == 0). Returns (E, C) accumulators."""
    e, shot, h, w, c = f_s.shape
    assert shot == 1 and e % tile == 0, (f_s.shape, tile)
    big_h, big_w = pw.shape[-2:]
    a = jnp.asarray(interp_matrix_align_corners(big_h, h))
    b = jnp.asarray(interp_matrix_align_corners(big_w, w))
    pw_signed = (pw - 2.0 * pwy).reshape(e // tile, tile, big_h, big_w)
    chunk = 128 if c % 128 == 0 else c
    n_chunks = c // chunk
    fs_chunked = f_s.reshape(e, h, w, n_chunks, chunk).transpose(0, 3, 1, 2, 4)
    fs_chunked = fs_chunked.reshape(e // tile, tile * n_chunks, h, w, chunk)
    u0_t = u0.reshape(e // tile, tile * n_chunks, chunk)

    kernel = functools.partial(_tiled_kernel, num_steps, lr, tile, n_chunks)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[vmem() for _ in range(5)],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((tile * n_chunks, chunk), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                127 * 1024 * 1024,
                _vmem_need_tiled(tile, h, w, c, big_h, big_w),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_steps * tile * (
                2 * h * w * c + 2 * big_h * h * w + 2 * big_h * big_w * w
            ),
            bytes_accessed=tile * (h * w * c + big_h * big_w) * 4,
            transcendentals=num_steps * tile * big_h * big_w,
        ),
    )
    acc = jax.vmap(call, in_axes=(0, None, None, 0, 0))(
        fs_chunked.astype(jnp.float32), a, b,
        pw_signed.astype(jnp.float32), u0_t.astype(jnp.float32),
    )
    return acc.reshape(e, c)


@functools.lru_cache(maxsize=None)
def batched_adapt_binary(num_steps: int, lr: float):
    """custom_vmap wrapper: per-episode kernel unbatched, tiled kernel under
    ``jax.vmap`` (the engines vmap whole episodes, so the episode axis is
    only visible to a batching rule)."""
    from jax.custom_batching import custom_vmap

    def plain(f_s, pw, pwy, u0):
        return adapt_binary_pallas(f_s, pw, pwy, u0,
                                   num_steps=num_steps, lr=lr)

    fn = custom_vmap(plain)

    @fn.def_vmap
    def _rule(axis_size, in_batched, f_s, pw, pwy, u0):  # noqa: ANN001
        ops = [f_s, pw, pwy, u0]
        for i, (x, bt) in enumerate(zip(ops, in_batched)):
            if not bt:
                ops[i] = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        f_s, pw, pwy, u0 = ops
        shot, h, w, c = f_s.shape[1:]
        big_h, big_w = pw.shape[-2:]
        tile = _pick_tile(axis_size, shot, h, w, c, big_h, big_w)
        if tile > 1:
            out = adapt_binary_pallas_tiled(
                f_s, pw, pwy, u0, num_steps=num_steps, lr=lr, tile=tile
            )
        else:
            out = jax.vmap(plain)(f_s, pw, pwy, u0)
        return out, True

    return fn


@functools.partial(jax.jit, static_argnames=("num_steps", "lr", "interpret"))
def adapt_binary_pallas(
    f_s: jnp.ndarray,        # (shot, h, w, C) support features
    pw: jnp.ndarray,         # (shot, H, W) normalized pixel weights
    pwy: jnp.ndarray,        # (shot, H, W) pw * y
    u0: jnp.ndarray,         # (C,) initial row difference W1 - W0
    num_steps: int,
    lr: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns the accumulated gradient sum acc (C,); the caller forms
    W1 = W1_0 - lr*acc, W0 = W0_0 + lr*acc."""
    shot, h, w, c = f_s.shape
    big_h, big_w = pw.shape[-2:]
    a = jnp.asarray(interp_matrix_align_corners(big_h, h))
    b = jnp.asarray(interp_matrix_align_corners(big_w, w))
    pw_signed = pw - 2.0 * pwy            # pw where y=0, -pw where y=1
    chunk = 128 if c % 128 == 0 else c
    n_chunks = c // chunk
    fs_chunked = f_s.reshape(shot, h, w, n_chunks, chunk).transpose(0, 3, 1, 2, 4)
    fs_chunked = fs_chunked.reshape(shot * n_chunks, h, w, chunk)

    kernel = functools.partial(_kernel, num_steps, lr, shot)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        kernel,
        in_specs=[vmem() for _ in range(5)],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # Grant exactly the modeled need (same model as the _fits_vmem
            # dispatch gate, so a dispatched shape always has enough scoped
            # VMEM). Over-asking pushes Mosaic into worse allocation
            # decisions — a blanket 127 MiB limit cost 11 eps/s at 1-shot —
            # and under-asking fails at compile (a 5-shot OOM was traced to
            # a formula that ignored the per-shot unrolled transients).
            vmem_limit_bytes=min(
                127 * 1024 * 1024,
                _vmem_need(shot, h, w, c, big_h, big_w),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_steps * shot * (
                2 * h * w * c + 2 * big_h * h * w + 2 * big_h * big_w * w
            ),
            bytes_accessed=shot * (h * w * c + big_h * big_w) * 4,
            transcendentals=num_steps * shot * big_h * big_w,
        ),
    )(
        fs_chunked.astype(jnp.float32),
        a, b,
        pw_signed.astype(jnp.float32),
        u0.reshape(n_chunks, chunk).astype(jnp.float32),
    )
    return acc.reshape(c)


def _vmem_need(shot: int, h: int, w: int, c: int, big_h: int, big_w: int) -> int:
    """VMEM-need model (bytes), calibrated against Mosaic's measured usage.

    Double-buffered inputs across the vmap grid, plus ~8 live (H, W) pixel
    maps of shot-loop transients (d473/g/sigmoid). With the multi-shot
    fori_loop the transients are REUSED across shots (budget two shots'
    worth for pipelining margin) — the earlier static unroll kept 8 maps per
    shot live (measured 122.2 MB at 5-shot); the loop form compiles and runs
    within this model's 106 MB 5-shot grant. Plus fixed scratch.
    """
    return (
        4 * 2 * (
            shot * h * w * c               # f_s
            + shot * big_h * big_w         # sign-packed pixel weights
            + big_h * h + big_w * w        # A (big_h, h), B (big_w, w)
        )
        + 4 * (3 * big_h * big_w + h * w * 128)   # fixed scratch
        + min(shot, 2) * 8 * big_h * big_w * 4    # shot-loop transients
        + 4 * 1024 * 1024                         # safety margin
    )


def _fits_vmem(shot: int, h: int, w: int, c: int, big_h: int, big_w: int) -> bool:
    """Dispatch gate: the modeled need fits the 127 MiB scoped budget.

    Beyond it (e.g. 6-shot @473) the dispatcher falls back to the XLA scan
    instead of OOMing at Mosaic compile time. The SAME model sizes the
    kernel's vmem_limit_bytes grant, so gate and grant cannot disagree.
    """
    return _vmem_need(shot, h, w, c, big_h, big_w) < 127 * 1024 * 1024


def pallas_inner_loop_available(f_s_shape: Tuple[int, ...],
                                label_shape: Tuple[int, ...]) -> bool:
    """Dispatch check: TPU backend, single shot, fits VMEM."""
    import os

    if os.environ.get("FSS_DISABLE_PALLAS") == "1":  # A/B vs the XLA scan
        return False
    if not HAVE_PALLAS:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    shot, h, w, c = f_s_shape
    return _fits_vmem(shot, h, w, c, label_shape[-2], label_shape[-1])
