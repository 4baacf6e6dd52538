"""Classifier Weight Transformer — the paper's core trainable module (flax).

Re-design of ``MultiHeadAttentionOne`` (reference: src/model/transformer.py:33-83):
a single cross-attention block where the *queries* are the 2x512 episodic
classifier weights and the keys/values are the flattened (h*w, 512) query-image
feature map. Q, K and V share one projection matrix (``w_qkvs``), attention is
scaled dot-product with temperature sqrt(d_k), attention-weight dropout 0.1,
then an output projection + dropout + residual + LayerNorm.

Shapes are tiny (len_q = num_classes = 2; len_k = 3600), so the whole block is
three einsums — no Pallas needed; XLA fuses the softmax epilogue. The module
is vmappable over episode batches.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MultiHeadAttentionOne(nn.Module):
    """Shared-projection multi-head cross-attention over a feature map."""

    n_head: int = 1
    d_model: int = 512
    d_k: int = 512
    d_v: int = 512
    dropout: float = 0.5        # output dropout (reference ctor arg, 0.5 in trainers)
    attn_dropout: float = 0.1   # dropout on attention weights

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,          # (B, len_q, d_model) classifier weights
        k: jnp.ndarray,          # (B, h, w, d_model) NHWC feature map (or (B, L, C))
        v: jnp.ndarray,          # same layout as k
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if k.ndim == 4:
            k = k.reshape(k.shape[0], -1, k.shape[-1])
        if v.ndim == 4:
            v = v.reshape(v.shape[0], -1, v.shape[-1])

        b, len_q, _ = q.shape

        w_qkvs = nn.Dense(
            self.n_head * self.d_k,
            use_bias=False,
            kernel_init=nn.initializers.normal(
                stddev=float(np.sqrt(2.0 / (self.d_model + self.d_k)))
            ),
            name="w_qkvs",
        )
        residual = q
        # (B, L, n_head, d_k) -> (B, n_head, L, d_k)
        qp = w_qkvs(q).reshape(b, len_q, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kp = w_qkvs(k).reshape(b, k.shape[1], self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vp = w_qkvs(v).reshape(b, v.shape[1], self.n_head, self.d_v).transpose(0, 2, 1, 3)

        temperature = float(np.sqrt(self.d_k))
        attn = jnp.einsum(
            "bnqd,bnkd->bnqk", qp, kp, preferred_element_type=jnp.float32
        ) / temperature
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(rate=self.attn_dropout)(attn, deterministic=deterministic)
        out = jnp.einsum(
            "bnqk,bnkd->bnqd", attn, vp.astype(attn.dtype),
            preferred_element_type=jnp.float32,
        )
        # (B, n_head, len_q, d_v) -> (B, len_q, n_head*d_v)
        out = out.transpose(0, 2, 1, 3).reshape(b, len_q, self.n_head * self.d_v)
        out = nn.Dense(
            self.d_model,
            kernel_init=nn.initializers.xavier_normal(),
            name="fc",
        )(out.astype(q.dtype))
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out + residual)
        return out


def build_cwt(cfg) -> MultiHeadAttentionOne:
    """CWT transformer from config (reference: src/train.py:96)."""
    d = cfg.bottleneck_dim
    return MultiHeadAttentionOne(
        n_head=cfg.heads, d_model=d, d_k=d, d_v=d, dropout=0.5
    )
