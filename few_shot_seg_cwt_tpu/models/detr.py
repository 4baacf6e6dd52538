"""DeTr head: cross-attention matching + optional deformable self-attention.

Parity target (reference: src/model/detr.py:13-75): concatenate the chosen
mid-level backbone features ('l34' -> layer3+layer4 last blocks), 1x1-reduce
to ``reduce_dim``, then blend MatchNet cross-attention and/or deformable
self-attention readouts into the L2-normalized query feature with weight
``att_wt``. Used by the train_trans trainer.

API note: the reference indexes its feature container with stale list
positions (detr.py:52-57 vs the dict returned by pspnet.py:272-287 — a known
drift); the intended semantics, used here, are "last block of each selected
stage".
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.corr import l2norm
from .deform import DeformAtt
from .matching import MatchNet, block_remat_default

_default_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

IN_DIM_LOOKUP = {"l2": 512, "l3": 1024, "l4": 2048, "l34": 1024 + 2048, "l23": 512 + 1024}


class DeTr(nn.Module):
    rmid: str = "l34"
    reduce_dim: int = 512
    sf_att: bool = False
    cs_att: bool = True
    temp: float = 20.0
    att_wt: float = 0.5
    drop: bool = False
    block_remat: bool = True

    def setup(self):
        self.adjust_conv = nn.Conv(
            self.reduce_dim, (1, 1), use_bias=False,
            kernel_init=_default_kernel_init, name="adjust",
        )
        if self.drop:
            self.adjust_dropout = nn.Dropout(rate=0.5, broadcast_dims=(-3, -2))
        if self.cs_att:
            self.cross_trans = MatchNet(
                temp=self.temp, cv_type="red", sce=False, sym_mode=True,
                name="cross_trans", block_remat=self.block_remat,
            )
        if self.sf_att:
            self.self_trans = DeformAtt(
                embed_dims=self.reduce_dim, n_levels=1, n_heads=8, n_points=9,
                name="self_trans",
            )

    def adjust_feature(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        x = nn.relu(self.adjust_conv(x))
        if self.drop:
            x = self.adjust_dropout(x, deterministic=deterministic)
        return x

    def compute_feat(self, fq_feats: Dict, fs_feats: Dict, deterministic: bool):
        stages = [int(c) for c in self.rmid[1:]]
        fq = jnp.concatenate([fq_feats[s][-1] for s in stages], axis=-1)
        fs = jnp.concatenate([fs_feats[s][-1] for s in stages], axis=-1)
        return (
            self.adjust_feature(fq, deterministic),
            self.adjust_feature(fs, deterministic),
        )

    def __call__(
        self,
        fq_feats: Dict,
        fs_feats: Dict,
        f_q: jnp.ndarray,    # (1, h, w, C)
        f_s: jnp.ndarray,    # (shot, h, w, C)
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        fq_fea, fs_fea = self.compute_feat(fq_feats, fs_feats, deterministic)

        sa_fq = None
        ca_fq = None
        if self.cs_att:
            ca_fq = self.cross_trans(fq_fea, fs_fea, f_s)
            f_q = l2norm(f_q, axis=-1) + l2norm(ca_fq, axis=-1) * self.att_wt
        if self.sf_att:
            sa_fq = self.self_trans(fq_fea, f_q, padding_mask=padding_mask)
            f_q = l2norm(f_q, axis=-1) + l2norm(sa_fq, axis=-1) * self.att_wt
        return f_q, sa_fq, ca_fq


def build_detr(cfg) -> DeTr:
    return DeTr(
        rmid=cfg.rmid,
        reduce_dim=cfg.get("reduce_dim", 512),
        sf_att=bool(cfg.get("sf_att", False)),
        cs_att=bool(cfg.get("cr_att", cfg.get("cs_att", True))),
        temp=cfg.temp,
        att_wt=cfg.att_wt,
        drop=bool(cfg.get("drop", False)),
        block_remat=block_remat_default(cfg, "red"),
    )
