"""Neighbourhood-consensus matching heads (flax).

Re-design of the reference matching stack (reference: src/model/match.py):

* ``NeighConsensus`` (src:56-85): stack of 4D convs + ReLU, optionally run
  symmetrically (f(x) + swap(f(swap(x)))) over the query/support planes;
* ``MatchNet`` (src:88-183): cosine correlation -> mutual matching -> 4D
  filtering -> mutual matching -> temperature softmax readout of support
  values, with optional ignore masks and cycle-consistency masking;
* ``SpatialContextEncoder`` (src/model/base/spatial_context.py): the
  reference computes local self-similarity with an O(h*w) Python loop; here
  it is one full correlation matmul plus a static-index window gather.

Correlation volumes are channels-last (B, h, w, h_s, w_s, C).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.corr import (get_corr, l2norm, masked_attention_readout,
                        mutual_matching, mutual_matching_bqsc,
                        mutual_matching_flat)
from .conv4d import CenterPivotConv4d, Conv4d

CONV4D = {"red": CenterPivotConv4d, "cv4": Conv4d}


def _swap_planes(x: jnp.ndarray) -> jnp.ndarray:
    """Swap query and support planes of (B, h, w, hs, ws, C)."""
    return x.transpose(0, 3, 4, 1, 2, 5)


def ncons_r4_active(cv_type: str) -> bool:
    """True when the rank-4 (B, Q, S, C) consensus route is in effect.

    The default TPU path for center-pivot stacks (round 4): the whole
    mutual-matching + consensus pipeline stays rank-4 so the query-plane
    transposes lower as fast rank-4 permutations instead of the ~3x-slower
    6D plane swaps (measured 3.6 vs 11.2 ms per 518 MB volume — and XLA
    canonicalizes any reshape-wrapped rank-4 transpose back into the slow
    6D form, so the layout must hold end to end). ``FSS_NCONS_R4=0``
    restores the 6D route; the opt-in Pallas pivot kernels take precedence
    (they consume the channels-major flat layout).
    """
    import os

    from ..ops.pallas_pivot import pivot_pallas_active

    if cv_type != "red" or os.environ.get("FSS_NCONS_R4") == "0":
        return False
    return not pivot_pallas_active()


def block_remat_default(cfg, cv_type: str) -> bool:
    """Per-block remat policy for consensus stacks: cfg `remat_blocks` wins.

    Default: OFF on the rank-4 route (the recompute costs ~25% of the head
    train step and the 473px protocol fits single-chip HBM without it —
    measured, BENCH.md round 4), ON for the 6D fallback (the historical
    memory-bounding behavior).
    """
    want = cfg.get("remat_blocks", None)
    if want is not None:
        return bool(want)
    return not ncons_r4_active(cv_type)


class NeighConsensus(nn.Module):
    kernel_sizes: Sequence[int] = (3, 3, 3)
    channels: Sequence[int] = (10, 10, 1)
    symmetric_mode: bool = True
    conv: str = "red"
    # Per-block rematerialization. The recompute costs ~25% of the train
    # step (measured: rank-4 sym-stack grad 118 ms plain vs 158 ms with
    # block remat); the rank-4 route fits the 473px protocol without it, so
    # heads pass block_remat=False there (cfg `remat_blocks` overrides).
    # Forward-only use (eval/serving) is unaffected either way.
    block_remat: bool = True

    def setup(self):
        blocks = []
        for i, (ksz, ch) in enumerate(zip(self.kernel_sizes, self.channels)):
            # when remat'ing, each 4D-conv block recomputes in the backward
            # so only the block INPUTS stay live as residuals (the
            # 10-channel volume activations are ~1 GB/episode at 60x60).
            # static_argnums: (self, x, swap_roles, fuse_relu, flat_dims,
            # bqsc) — all flags select the conv program at trace time.
            base = CONV4D[self.conv]
            kwargs = dict(out_channels=ch, kernel_size=(ksz,) * 4,
                          padding=(ksz // 2,) * 4, use_bias=True,
                          name=f"conv4d_{i}")
            static = (2,)
            if base is CenterPivotConv4d:
                kwargs["stride"] = (1,) * 4
                static = (2, 3, 4, 5)
            if self.block_remat:
                base = nn.remat(base, static_argnums=static)
            blocks.append(base(**kwargs))
        self.blocks = blocks

    def _stack(self, x: jnp.ndarray, swap_roles: bool = False) -> jnp.ndarray:
        for blk in self.blocks:
            if self.conv == "red":  # remat static_argnums needs all args present
                x = nn.relu(blk(x, swap_roles, False, None, False))
            else:
                x = nn.relu(blk(x, swap_roles))
        return x

    def _stack_flat(self, x: jnp.ndarray, dims, swap_roles: bool) -> jnp.ndarray:
        # relu fused into the pivot op; the Pallas path's custom VJP bounds
        # backward memory by construction (residuals are the streamed block
        # inputs), so no extra remat wrapper is needed here
        for blk in self.blocks:
            x = blk(x, swap_roles, True, dims, False)
        return x

    def _stack_bqsc(self, x: jnp.ndarray, dims, swap_roles: bool) -> jnp.ndarray:
        for blk in self.blocks:
            x = blk(x, swap_roles, True, dims, True)
        return x

    def bqsc(self, x: jnp.ndarray, dims) -> jnp.ndarray:
        """Rank-4 route: x (B, h*w, hs*ws, C) -> (B, h*w, hs*ws, C_out).

        Symmetric mode uses the role-swapped identity
        ``swap(stack(swap(x))) == stack_with_exchanged_kernels(x)`` so there
        are NO outer plane swaps; the only transposes left are the rank-4
        permutations inside each pivot's query-plane conv. Exactly the 6D
        math (tests/test_matching_r4.py).
        """
        dims = tuple(int(d) for d in dims)
        if self.symmetric_mode:
            return (self._stack_bqsc(x, dims, False)
                    + self._stack_bqsc(x, dims, True))
        return self._stack_bqsc(x, dims, False)

    def __call__(self, x: jnp.ndarray, flat_dims=None) -> jnp.ndarray:
        """x: (B, h, w, hs, ws, C) channels-last, or (B, C, h*w, hs*ws) when
        ``flat_dims=(h, w, hs, ws)`` (the Pallas pivot-kernel layout)."""
        if flat_dims is not None:
            from ..ops.pallas_pivot import pivot_pallas_active

            dims = tuple(int(d) for d in flat_dims)
            if not (self.conv == "red"
                    and pivot_pallas_active(self.kernel_sizes)):
                # default path: ONE layout conversion around the whole 6D
                # stack (the per-block Pallas path is exact but measured
                # slower than XLA's convs on v5e — BENCH.md "Pivot kernel
                # refutation"; re-enable with FSS_PIVOT_PALLAS=1)
                b, c = x.shape[0], x.shape[1]
                hq, wq, hs, ws = dims
                x6 = x.reshape(b, c, hq, wq, hs, ws).transpose(0, 2, 3, 4, 5, 1)
                out = self(x6)
                return out.transpose(0, 5, 1, 2, 3, 4).reshape(
                    b, out.shape[-1], hq * wq, hs * ws)
            if self.symmetric_mode:
                return (self._stack_flat(x, dims, False)
                        + self._stack_flat(x, dims, True))
            return self._stack_flat(x, dims, False)
        if self.symmetric_mode:
            # the reference's symmetric form (src/model/match.py:79). The
            # transpose-free alternative — running the same blocks with conv
            # roles exchanged (swap_roles=True, used by the Pallas flat path)
            # — is mathematically identical and measured EQUAL in time
            # (138.1 vs 135.7 ms stack fwd), but its rematted backward keeps
            # differently-laid-out volume temporaries live and pushed the
            # 473px MMN train step ~0.8 GB past HBM; the materialized swaps
            # keep the old peak-memory behavior.
            return self._stack(x) + _swap_planes(self._stack(_swap_planes(x)))
        return self._stack(x)


@functools.lru_cache(maxsize=None)
def _window_gather_indices(h: int, w: int, ksz: int) -> Tuple[np.ndarray, np.ndarray]:
    """(hw, ksz*ksz) flat indices into an (hw,) axis + validity mask."""
    pad = ksz // 2
    idx = np.zeros((h * w, ksz * ksz), np.int32)
    valid = np.zeros((h * w, ksz * ksz), bool)
    for i in range(h):
        for j in range(w):
            n = i * w + j
            t = 0
            for di in range(-pad, pad + 1):
                for dj in range(-pad, pad + 1):
                    ii, jj = i + di, j + dj
                    ok = 0 <= ii < h and 0 <= jj < w
                    idx[n, t] = (ii * w + jj) if ok else 0
                    valid[n, t] = ok
                    t += 1
    return idx, valid


def spatial_descriptor(x: jnp.ndarray, ksz: int) -> jnp.ndarray:
    """Local self-similarity: (B, h, w, C) -> (B, h, w, ksz*ksz).

    Equivalent to the reference's per-pixel loop (spatial_context.py:13-60)
    — descriptor[n, t] = <x[n], x[neighbor_t(n)]> with zero padding —
    computed as one Gram matmul + static window gather.
    """
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    gram = jnp.einsum("bnc,bmc->bnm", flat, flat, preferred_element_type=jnp.float32)
    idx, valid = _window_gather_indices(h, w, ksz)
    gathered = jnp.take_along_axis(
        gram, jnp.asarray(idx)[None].repeat(b, 0), axis=2
    )
    gathered = jnp.where(jnp.asarray(valid)[None], gathered, 0.0)
    return gathered.reshape(b, h, w, ksz * ksz)


class SpatialContextEncoder(nn.Module):
    kernel_size: int = 25
    hidden_dim: int = 2048

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gs = spatial_descriptor(x, self.kernel_size)
        gs = gs / jnp.sqrt(jnp.sum(gs**2, axis=-1, keepdims=True) + 1e-6)
        cat = jnp.concatenate([x, gs], axis=-1)
        out = nn.Conv(self.hidden_dim, (1, 1), name="embed")(cat)
        return nn.relu(out)


class MatchNet(nn.Module):
    """Correlation filtering + attention readout head."""

    temp: float = 3.0
    cv_type: str = "red"
    in_channel: int = 1
    sce: bool = False
    cyc: bool = False
    sym_mode: bool = True
    cv_kernels: Sequence[int] = (3, 3, 3)
    cv_channels: Sequence[int] = (10, 10, 1)
    ass_drop: float = 0.1
    block_remat: bool = True

    def setup(self):
        if self.sce:
            ksz = 25
            self.sce_encoder = SpatialContextEncoder(
                kernel_size=ksz, hidden_dim=2048, name="sce"
            )
        if self.cyc:
            self.ass_dropout = nn.Dropout(rate=self.ass_drop)
        self.consensus = NeighConsensus(
            kernel_sizes=tuple(self.cv_kernels), channels=tuple(self.cv_channels),
            symmetric_mode=self.sym_mode, conv=self.cv_type, name="ncons",
            block_remat=self.block_remat,
        )

    def run_match_model(self, corr4d: jnp.ndarray) -> jnp.ndarray:
        corr4d = mutual_matching(corr4d)
        corr4d = self.consensus(corr4d)
        corr4d = mutual_matching(corr4d)
        return corr4d

    def run_match_model_flat(self, corr: jnp.ndarray, dims) -> jnp.ndarray:
        """Flat pipeline: (B, C, Q, S) in, (B, Q, S) filtered corr out.

        With the opt-in Pallas pivot kernel the whole pipeline stays in the
        channels-major layout (zero whole-volume transposes). On the default
        XLA path the volume converts to channels-last ONCE around the
        original 6D pipeline — interleaving flat and 6D stages kept two
        whole-volume copies live under the head-loss remat and pushed the
        473px MMN train step out of HBM.
        """
        from ..ops.pallas_pivot import pivot_pallas_active

        hq, wq, hs, ws = (int(d) for d in dims)
        if self.cv_type == "red" and pivot_pallas_active(self.cv_kernels):
            corr = mutual_matching_flat(corr)
            corr = self.consensus(corr, flat_dims=dims)
            corr = mutual_matching_flat(corr)
            return corr[:, 0]
        if ncons_r4_active(self.cv_type):
            b, c = corr.shape[0], corr.shape[1]
            if c == 1:
                xr = corr.reshape(b, hq * wq, hs * ws, 1)   # free view
            else:
                xr = corr.transpose(0, 2, 3, 1)             # one rank-4 move
            return self.run_match_model_bqsc(xr, dims)
        b, c = corr.shape[0], corr.shape[1]
        x6 = corr.reshape(b, c, hq, wq, hs, ws).transpose(0, 2, 3, 4, 5, 1)
        out = self.run_match_model(x6)[..., 0]
        return out.reshape(b, hq * wq, hs * ws)

    def run_match_model_bqsc(self, xr: jnp.ndarray, dims) -> jnp.ndarray:
        """Rank-4 pipeline: (B, h*w, hs*ws, C) volume -> (B, h*w, hs*ws).

        The round-4 default TPU route (see ncons_r4_active): mutual matching
        and the consensus stack all operate on the rank-4 layout, so every
        transpose in the program is a fast rank-4 permutation. Identical
        math to run_match_model (reference: src/model/match.py:142-157).
        """
        xr = mutual_matching_bqsc(xr)
        xr = self.consensus.bqsc(xr, dims)
        xr = mutual_matching_bqsc(xr)
        return xr[..., 0]

    def __call__(
        self,
        fq_fea: jnp.ndarray,      # (B, h, w, C) query features
        fs_fea: jnp.ndarray,      # (B, h, w, C) support features
        v: jnp.ndarray,           # (B, h, w, Cv) or (B, N_s, Cv) support values
        s_mask: Optional[jnp.ndarray] = None,
        ig_mask: Optional[jnp.ndarray] = None,
        use_cyc: bool = False,
        deterministic: bool = True,
        ret_corr: bool = False,
    ):
        b, h, w, _ = fq_fea.shape
        fq = l2norm(fq_fea, axis=-1)
        fs = l2norm(fs_fea, axis=-1)
        if self.sce:
            fq = self.sce_encoder(fq)
            fs = self.sce_encoder(fs)
        corr = get_corr(fq, fs)                     # (B, Q, S) — already flat
        corr2d = self.run_match_model_flat(corr[:, None], (h, w, h, w))

        if ig_mask is not None:
            corr2d = jnp.where(ig_mask[:, None, :], 1e-4, corr2d)
        if self.cyc and use_cyc:
            inconsistent = self.run_cyc(corr2d, s_mask, deterministic)
            corr2d = corr2d + inconsistent[:, None, :] * (-1000.0)

        weighted_v = self._readout(corr2d, v, h, w)
        if ret_corr:
            return weighted_v, corr2d.reshape(b, h, w, h, w)
        return weighted_v

    def corr_forward(self, corr4d: jnp.ndarray, v: jnp.ndarray, ret_attn: bool = False):
        """Filter a pre-built multi-channel volume (B, h, w, hs, ws, L).

        Delegates to the flat pipeline (free reshape for L == 1; one
        transpose otherwise — multi-channel callers like MMN build the flat
        layout directly via corr_forward_flat and never pay it).
        """
        b, h, w, hs, ws, ch = corr4d.shape
        assert ch == self.in_channel, (ch, self.in_channel)
        if ch == 1:
            flat = corr4d.reshape(b, 1, h * w, hs * ws)
        else:
            flat = corr4d.transpose(0, 5, 1, 2, 3, 4).reshape(
                b, ch, h * w, hs * ws)
        return self.corr_forward_flat(flat, v, (h, w, hs, ws), ret_attn)

    def corr_forward_flat(self, corr: jnp.ndarray, v: jnp.ndarray,
                          dims, ret_attn: bool = False):
        """Filter a flat channels-major volume (B, L, h*w, hs*ws)."""
        assert corr.shape[1] == self.in_channel, (corr.shape, self.in_channel)
        h, w = int(dims[0]), int(dims[1])
        corr2d = self.run_match_model_flat(corr, tuple(int(d) for d in dims))
        weighted_v = self._readout(corr2d, v, h, w)
        if ret_attn:
            return corr2d, weighted_v
        return weighted_v

    def corr_forward_bqsc(self, corr: jnp.ndarray, v: jnp.ndarray,
                          dims, ret_attn: bool = False):
        """Filter a rank-4 channels-last volume (B, h*w, hs*ws, L).

        The zero-transpose entry for multi-channel builders (MMN stacks
        get_corr outputs on the trailing axis so the volume is born in the
        rank-4 route's layout).
        """
        assert corr.shape[-1] == self.in_channel, (corr.shape, self.in_channel)
        h, w = int(dims[0]), int(dims[1])
        corr2d = self.run_match_model_bqsc(corr, tuple(int(d) for d in dims))
        weighted_v = self._readout(corr2d, v, h, w)
        if ret_attn:
            return corr2d, weighted_v
        return weighted_v

    def _readout(self, corr2d, v, h, w):
        out = masked_attention_readout(corr2d, v, temp=self.temp)
        return out.reshape(out.shape[0], h, w, out.shape[-1])

    def run_cyc(self, corr2d, s_mask, deterministic):
        """Cycle-consistency mask: 1.0 where support->query->support flips label."""
        b, n_q, n_s = corr2d.shape
        s_mask = s_mask.reshape(b, n_s)
        k2q = jnp.argmax(corr2d, axis=1)   # (B, n_s) best query per support px
        q2k = jnp.argmax(corr2d, axis=2)   # (B, n_q) best support per query px
        remap = jnp.take_along_axis(q2k, k2q, axis=1)         # support -> support
        remap_mask = jnp.take_along_axis(s_mask, remap, axis=1)
        inconsistent = (s_mask != remap_mask).astype(jnp.float32)
        return self.ass_dropout(inconsistent, deterministic=deterministic)
