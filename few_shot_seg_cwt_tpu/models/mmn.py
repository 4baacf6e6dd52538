"""MMN: multi-layer matching network (the main extension head).

Parity target (reference: src/model/mmn.py:11-88): build a 4D cosine
correlation from every selected backbone block (``rmid`` picks stages,
``all_lr`` decides whether every bottleneck block of a stage contributes or
only the last), optionally reduce dims / locally smooth each feature first,
concatenate (or sum) the correlation channels, filter them with MatchNet's
neighbourhood consensus, and blend the attention readout into the query
feature: fq = f_q * (1 - att_wt) + att_fq * att_wt.

Used by the kshot / ddp / aug / cca trainers.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.corr import get_corr
from .matching import MatchNet, block_remat_default
from .msm import WeightAverage
from .resnet import RESNET_DEPTHS

_default_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def parse_bids(rmid: str) -> List[int]:
    """'l34' -> [3, 4] (reference: src/model/mmn.py:18)."""
    return [int(ch) for ch in rmid[1:]]


class MMN(nn.Module):
    """Multi-layer matching over backbone block features."""

    bids: Sequence[int] = (3, 4)
    all_lr: str = "l"
    nbottlenecks: Sequence[int] = (3, 4, 6, 3)
    agg: str = "cat"
    wa: bool = False
    red_dim: int = 0              # 0 = off
    temp: float = 3.0
    cv_type: str = "red"
    att_wt: float = 0.5
    att_drop: float = 0.0
    proj_drop: float = 0.0
    feature_channels: Sequence[int] = (256, 512, 1024, 2048)
    block_remat: bool = True

    def setup(self):
        if self.wa or self.red_dim:
            rd, wa = {}, {}
            for bid in self.bids:
                if self.red_dim:
                    rd[str(bid)] = nn.Conv(
                        self.red_dim, (1, 1), use_bias=False,
                        kernel_init=_default_kernel_init, name=f"rd_{bid}",
                    )
                if self.wa:
                    wa[str(bid)] = WeightAverage(
                        att_drop=self.att_drop, proj_drop=self.proj_drop,
                        name=f"wa_{bid}",
                    )
            self.rd = rd if self.red_dim else None
            self.wa_mods = wa if self.wa else None
        if self.agg == "sum":
            in_ch = 1
        else:
            in_ch = sum(
                self.nbottlenecks[b - 1] if str(b) in str(self.all_lr) else 1
                for b in self.bids
            )
        self.corr_net = MatchNet(
            temp=self.temp, cv_type=self.cv_type, sce=False, cyc=False,
            sym_mode=True, in_channel=in_ch, name="corr_net",
            block_remat=self.block_remat,
        )

    def _selected(self, feats: Dict) -> List:
        """(stage, feature) pairs per rmid/all_lr selection, reversed stage order."""
        out = []
        for bid in list(self.bids)[::-1]:
            blocks = feats[bid]
            chosen = blocks if str(bid) in str(self.all_lr) else [blocks[-1]]
            out.extend((bid, f) for f in chosen)
        return out

    def prep_query(self, fq_feats: Dict, deterministic: bool = True) -> List:
        """Query-side per-layer prep (rd conv + WeightAverage), shot-free.

        Returns the processed query feature per selected layer, in
        ``_selected`` order — the exact tensors ``__call__`` computes on its
        query branch. The k-shot scan hoists this out of the per-shot body
        (episodic/heads.py _mmn_att_shots): the query features do not depend
        on the shot, so with a per-shot ``lax.map`` + ``jax.checkpoint`` the
        stage-3/4 WeightAverage (~75 GFLOP at 60x60) would otherwise run
        2 x shot times (forward + remat recompute) instead of once.
        """
        out = []
        for bid, fq_fea in self._selected(fq_feats):
            if self.red_dim:
                fq_fea = nn.relu(self.rd[str(bid)](fq_fea))
            if self.wa:
                fq_fea = self.wa_mods[str(bid)](fq_fea, deterministic=deterministic)
            out.append(fq_fea)
        return out

    def __call__(
        self,
        fq_feats: Dict,          # {stage: [block feats (1, h', w', C)]} query
        fs_feats: Dict,          # {stage: [block feats (shot, h', w', C)]} support
        f_q: jnp.ndarray,        # (1, h, w, 512) episode query feature
        f_s: jnp.ndarray,        # (shot, h, w, 512) episode support feature
        ret_attn: bool = False,
        ret_shots: bool = False,
        deterministic: bool = True,
        fq_prepped: Optional[List] = None,  # prep_query output (hoisted)
    ):
        shot, h, w, _ = f_s.shape
        corr_ch: List[jnp.ndarray] = []
        for i, ((bid, fq_fea), (_, fs_fea)) in enumerate(zip(
            self._selected(fq_feats), self._selected(fs_feats)
        )):
            if fq_prepped is not None:
                # query branch already processed (one shared dropout draw
                # when not deterministic — see prep_query / _mmn_att_shots)
                fq_fea = jnp.broadcast_to(
                    fq_prepped[i], (shot,) + fq_prepped[i].shape[1:])
            else:
                fq_fea = jnp.broadcast_to(fq_fea, (shot,) + fq_fea.shape[1:])
                if self.red_dim:
                    fq_fea = nn.relu(self.rd[str(bid)](fq_fea))
                if self.wa:
                    fq_fea = self.wa_mods[str(bid)](
                        fq_fea, deterministic=deterministic)
            if self.red_dim:
                fs_fea = nn.relu(self.rd[str(bid)](fs_fea))
            if self.wa:
                fs_fea = self.wa_mods[str(bid)](fs_fea, deterministic=deterministic)
            corr_ch.append(get_corr(fq_fea, fs_fea))      # (shot, Nq, Ns)

        # stack the per-layer correlations directly in whichever layout the
        # active consensus route consumes, so the multi-channel volume is
        # BORN in that layout and no whole-volume transpose exists anywhere:
        # rank-4 (shot, Nq, Ns, L) channels-last for the default rank-4
        # route; channels-major (shot, L, Nq, Ns) for the Pallas pivot
        # kernels / 6D fallback (get_corr's natural layout either way —
        # stacking on a new axis is a layout choice, not a transpose).
        from .matching import ncons_r4_active

        if ncons_r4_active(self.cv_type):
            corr_r4 = jnp.stack(corr_ch, axis=-1)
            if self.agg == "sum":
                corr_r4 = jnp.sum(corr_r4, axis=-1, keepdims=True)
            attn, att_shots = self.corr_net.corr_forward_bqsc(
                corr_r4, v=f_s, dims=(h, w, h, w), ret_attn=True)
        else:
            corr_flat = jnp.stack(corr_ch, axis=1)
            if self.agg == "sum":
                corr_flat = jnp.sum(corr_flat, axis=1, keepdims=True)
            attn, att_shots = self.corr_net.corr_forward_flat(
                corr_flat, v=f_s, dims=(h, w, h, w), ret_attn=True)
        att_fq = jnp.mean(att_shots, axis=0, keepdims=True)  # average over shots
        fq = f_q * (1.0 - self.att_wt) + att_fq * self.att_wt
        if ret_shots:
            return fq, att_fq, att_shots  # (shot, h, w, C) pre-mean readouts
        if ret_attn:
            return attn, fq, att_fq
        return fq, att_fq


def build_mmn(cfg) -> MMN:
    assert cfg.get("rmid"), (
        "MMN needs the rmid config (which backbone stages to correlate), "
        "e.g. --opts rmid 'l34'"
    )
    return MMN(
        bids=tuple(parse_bids(cfg.rmid)),
        all_lr=str(cfg.all_lr),
        nbottlenecks=tuple(RESNET_DEPTHS[cfg.layers]),
        agg=cfg.get("agg", "cat"),
        wa=bool(cfg.get("wa", False)),
        red_dim=int(cfg.get("red_dim") or 0),
        temp=cfg.temp,
        cv_type=cfg.get("conv4d", "red"),
        att_wt=cfg.att_wt,
        att_drop=float(cfg.get("att_drop", 0.0)),
        proj_drop=float(cfg.get("proj_drop", 0.0)),
        block_remat=block_remat_default(cfg, cfg.get("conv4d", "red")),
    )
