"""Attention-variant zoo used by the train_att trainer.

Parity targets (reference: src/model/transformer.py:86-249): ``CrossAttention``
(masked multi-head cross-attention with -1000 additive support mask),
``MHA`` (pre-norm variant), ``AttentionBlock`` (cosine attention with a
learnable scale and ``LinearDiag`` output gates).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.corr import l2norm

_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class CrossAttention(nn.Module):
    n_head: int = 4
    dim: int = 512
    dim_v: int = 512
    ln: Optional[str] = None
    fv: Optional[str] = None
    fc: Optional[str] = None
    dropout: float = 0.1
    temp: Optional[float] = None
    trans_vn: bool = False

    @nn.compact
    def __call__(self, k, v, q, idt, s_valid_mask=None, deterministic: bool = True):
        b, n_q, c = q.shape
        _, n_s, d = v.shape
        head_dim = c // self.n_head
        temperature = self.temp if self.temp is not None else head_dim**-0.5

        if self.trans_vn:
            v = l2norm(v, axis=-1)
            idt = l2norm(idt, axis=-1)

        if self.ln == "ln":
            q = nn.LayerNorm(epsilon=1e-5, name="layer_norm_q")(q)
            k = nn.LayerNorm(epsilon=1e-5, name="layer_norm_k")(k)
        qk_fc = nn.Dense(self.dim, use_bias=False, kernel_init=_linear_init,
                         name="qk_fc")
        qp = qk_fc(q).reshape(b, n_q, self.n_head, -1).transpose(0, 2, 1, 3)
        kp = qk_fc(k).reshape(b, n_s, self.n_head, -1).transpose(0, 2, 1, 3)
        if self.fv == "fv":
            v = nn.Dense(self.dim_v, use_bias=False, kernel_init=_linear_init,
                         name="v_fc")(v)
        vp = v.reshape(b, n_s, self.n_head, -1).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qp, kp) * temperature
        attn = attn.reshape(b * self.n_head, n_q, n_s)
        if s_valid_mask is not None:
            m = jnp.repeat(s_valid_mask[:, None, :], self.n_head, 1)
            attn = attn + m.reshape(b * self.n_head, 1, n_s).astype(attn.dtype) * (-1000.0)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(rate=self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bqk,bkd->bqd", attn,
                         vp.reshape(b * self.n_head, n_s, -1))
        out = out.reshape(b, self.n_head, n_q, -1).transpose(0, 2, 1, 3).reshape(b, n_q, -1)
        if self.fc == "fc":
            out = nn.Dense(self.dim_v, kernel_init=nn.initializers.xavier_normal(),
                           name="fc")(out)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out + idt)
        return out, attn


class MHA(nn.Module):
    n_head: int = 4
    dim: int = 512
    dim_v: int = 512
    fv: bool = True
    fc: bool = True
    qkv_bias: bool = False
    proj_drop: float = 0.1
    attn_drop: float = 0.1

    @nn.compact
    def __call__(self, k, v, q, idt=None, s_valid_mask=None, deterministic: bool = True):
        q = nn.LayerNorm(epsilon=1e-5, name="norm1_q")(q)
        k = nn.LayerNorm(epsilon=1e-5, name="norm1_k")(k)
        v = nn.LayerNorm(epsilon=1e-5, name="norm1_v")(v)
        b, n_q, c = q.shape
        _, n_s, d = v.shape
        scale = (c // self.n_head) ** -0.5

        qk_fc = nn.Dense(self.dim, use_bias=self.qkv_bias, kernel_init=_linear_init,
                         name="qk_fc")
        qp = qk_fc(q).reshape(b, n_q, self.n_head, -1).transpose(0, 2, 1, 3)
        kp = qk_fc(k).reshape(b, n_s, self.n_head, -1).transpose(0, 2, 1, 3)
        if self.fv in (True, "fv"):
            v = nn.Dense(self.dim_v, use_bias=self.qkv_bias, kernel_init=_linear_init,
                         name="v_fc")(v)
        vp = v.reshape(b, n_s, self.n_head, -1).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qp, kp) * scale
        if s_valid_mask is not None:
            attn = attn + s_valid_mask[:, None, None, :].astype(attn.dtype) * (-1000.0)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(rate=self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
        out = out.transpose(0, 2, 1, 3).reshape(b, n_q, -1)
        if self.fc in (True, "fc"):
            out = nn.Dense(self.dim_v, kernel_init=_linear_init, name="proj")(out)
        out = nn.Dropout(rate=self.proj_drop)(out, deterministic=deterministic)
        return out + idt, attn


def _eye_plus_noise_init(key, shape, dtype=jnp.float32):
    n = shape[0]
    return jnp.eye(n, shape[1], dtype=dtype) + jax.random.normal(key, shape, dtype) * 0.001


class LinearDiag(nn.Module):
    mode: str = "l"       # 'l': scalar gate; 'ld': per-feature diagonal
    wt: float = 1.0
    num_features: int = 512
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        if self.mode == "l":
            w = self.param("weight", nn.initializers.constant(self.wt), ())
        else:
            w = self.param("weight", nn.initializers.constant(self.wt),
                           (self.num_features,))
        out = x * w
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.num_features,))
        return out


class AttentionBlock(nn.Module):
    dim: int = 2048
    dim_v: int = 512
    v_norm: bool = False
    mode: str = "l"
    scale_att: str = "sc"

    @nn.compact
    def __call__(self, k, v, q, idt, s_valid_mask=None, deterministic: bool = True):
        b, n_q, c = q.shape
        if self.v_norm in (True, "vn"):
            v = l2norm(v, axis=-1)
            idt = l2norm(idt, axis=-1)
        qk_fc = nn.Dense(self.dim, kernel_init=_eye_plus_noise_init,
                         bias_init=nn.initializers.zeros, name="qk_fc")
        qp = l2norm(qk_fc(q), axis=-1)
        kp = l2norm(qk_fc(k), axis=-1)
        scale = (
            self.param("scale_att", nn.initializers.constant(20.0), ())
            if self.scale_att == "sc" else 20.0
        )
        attn = scale * jnp.einsum("bqc,bkc->bqk", qp, kp)
        if s_valid_mask is not None:
            attn = attn + s_valid_mask[:, None, :].astype(attn.dtype) * (-1000.0)
        attn = jax.nn.softmax(attn, axis=-1)
        fq_att = jnp.einsum("bqk,bkd->bqd", attn, v)
        out = LinearDiag(mode=self.mode, wt=0.2, num_features=self.dim_v,
                         name="att_wt")(fq_att) + LinearDiag(
            mode=self.mode, wt=1.0, num_features=self.dim_v, name="org_wt")(idt)
        return out, attn


def build_attention_variant(cfg):
    """trans_type selector (reference: src/train_att.py:100-106)."""
    t = cfg.get("trans_type", "cross_att")
    d = cfg.bottleneck_dim
    if t == "cross_att":
        return CrossAttention(n_head=cfg.heads, dim=cfg.backbone_dim, dim_v=d,
                              ln=cfg.get("ln"), fv=cfg.get("fv"), fc=cfg.get("fc"),
                              temp=cfg.get("att_temp"), trans_vn=cfg.get("trans_vn", False))
    if t == "mha":
        return MHA(n_head=cfg.heads, dim=cfg.backbone_dim, dim_v=d)
    if t == "att_blk":
        return AttentionBlock(dim=cfg.backbone_dim, dim_v=d,
                              v_norm=cfg.get("trans_vn", False),
                              mode=cfg.get("ld_mode", "l"),
                              scale_att=cfg.get("scale_att", "sc"))
    raise ValueError(f"unknown trans_type {t}")
