"""Fused episodic classifier adaptation — the framework's hottest loop.

The reference runs 200 *Python-level* SGD steps per episode, each doing a
conv1x1 -> bilinear-upsample-to-473 -> weighted CE -> backward -> step on a
fresh binary classifier (reference: src/train.py:206-231, src/test.py:164-187,
src/model/pspnet.py:189-205). That loop dominates episode latency.

Here it is one ``jax.lax.scan`` over the (num_classes, C) weight matrix:

* the backbone runs once outside the loop (same as the reference);
* the conv1x1 is an einsum against the fixed (shot, h, w, C) support features;
* the 473x473 upsample is the align_corners matmul pair (ops.resize), so the
  entire step — forward, CE, gradient, SGD update — is a handful of MXU
  contractions XLA fuses into one kernel sequence;
* episodes batch via ``jax.vmap`` of the whole scan.

Loss semantics match the reference exactly: CE is evaluated at *label*
resolution after align_corners upsampling, with per-episode dynamic class
weights [1, n_bg/n_fg] and ignore_index 255. Padded support shots are labeled
255 everywhere, so they contribute neither to the weights nor the loss.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.losses import class_balance_weights, weighted_cross_entropy
from ..ops.resize import upsample_bilinear_ac


def support_loss(
    w: jnp.ndarray,          # (K, C) classifier weights
    f_s: jnp.ndarray,        # (shot, h, w, C) support features
    s_label: jnp.ndarray,    # (shot, H, W) int labels in {0, 1, 255}
    cls_weights: jnp.ndarray,  # (K,) CE class weights
    row_mask: Optional[jnp.ndarray] = None,  # (K,) bool; False rows excluded
) -> jnp.ndarray:
    logits = jnp.einsum(
        "shwc,ck->shwk", f_s, w.T, preferred_element_type=jnp.float32
    )
    if row_mask is not None:
        # emulate a narrower classifier: masked rows leave the softmax
        logits = jnp.where(row_mask[None, None, None, :], logits, -1e9)
    logits = upsample_bilinear_ac(logits, s_label.shape[-2:])
    return weighted_cross_entropy(logits, s_label, cls_weights)


def adapt_classifier(
    f_s: jnp.ndarray,
    s_label: jnp.ndarray,
    w_init: jnp.ndarray,
    num_steps: int = 200,
    lr: float = 0.0025,
    cls_weights: Optional[jnp.ndarray] = None,
    fast_binary: bool = True,
    row_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run the episodic inner loop; returns adapted (K, C) weights.

    Plain SGD (no momentum), matching ``optim.SGD(cls.parameters(), lr=cls_lr)``
    in the reference. For the binary (K=2) flagship case the exact closed-form
    gradient path below is used; set ``fast_binary=False`` to force the
    generic autodiff scan.
    """
    if cls_weights is None:
        cls_weights = class_balance_weights(s_label, num_classes=w_init.shape[0])
    if fast_binary and w_init.shape[0] == 2 and row_mask is None:
        return _adapt_binary(f_s, s_label, w_init, num_steps, lr, cls_weights)
    grad_fn = jax.grad(support_loss)

    def step(w, _):
        g = grad_fn(w, f_s, s_label, cls_weights, row_mask)
        return w - lr * g, None

    w, _ = jax.lax.scan(step, w_init, None, length=num_steps)
    return w


def _adapt_binary(f_s, s_label, w_init, num_steps, lr, cls_weights):
    """Exact binary-CE inner loop evolving only a (C,) accumulator.

    For K=2 the weighted-CE gradient w.r.t. the two logits is
    +-pw*(sigmoid(l1-l0) - y)/sum(pw), so the two weight rows move in exact
    opposition: W1_t = W1_0 - lr*acc_t, W0_t = W0_0 + lr*acc_t with
    acc_t = sum_tau g_tau @ f_s. Each step is two skinny matmuls, one
    upsample matmul pair and a sigmoid — far less work and scan state than
    differentiating the generic loss, and bitwise-equivalent math.
    """
    from ..ops.pallas_inner_loop import adapt_binary_pallas, pallas_inner_loop_available
    from ..ops.resize import interp_matrix_align_corners

    shot, h, w, c = f_s.shape
    big_h, big_w = s_label.shape[-2:]
    valid = (s_label != 255)
    fg = (s_label == 1)
    y = fg.astype(jnp.float32)
    pw = jnp.where(fg, cls_weights[1], cls_weights[0]) * valid.astype(jnp.float32)
    pw = pw / jnp.maximum(jnp.sum(pw), 1e-12)   # fold the 1/sum(pw) into pw

    if pallas_inner_loop_available(f_s.shape, s_label.shape):
        from ..ops.pallas_inner_loop import batched_adapt_binary

        u0 = (w_init[1] - w_init[0]).astype(jnp.float32)
        # custom_vmap wrapper: under the engines' episode vmap this dispatches
        # the episode-TILED kernel (independent per-episode gradient chains
        # interleaved inside one kernel instance); unbatched calls run the
        # per-episode kernel unchanged
        acc = batched_adapt_binary(num_steps, float(lr))(f_s, pw, pw * y, u0)
        return jnp.stack([w_init[0] + lr * acc, w_init[1] - lr * acc], axis=0)

    a = jnp.asarray(interp_matrix_align_corners(big_h, h))      # (H, h)
    b = jnp.asarray(interp_matrix_align_corners(big_w, w))      # (W, w)
    flat = f_s.reshape(shot * h * w, c)                          # (S*hw, C)
    u0 = (w_init[1] - w_init[0]).astype(jnp.float32)             # (C,)
    scale = 2.0 * lr

    def step(acc, _):
        u = u0 - scale * acc
        d60 = (flat @ u[:, None]).reshape(shot, h, w)            # (S, h, w)
        d473 = jnp.matmul(
            jnp.matmul(a, d60), b.T, preferred_element_type=jnp.float32
        )                                                        # A d B^T
        g = pw * (jax.nn.sigmoid(d473) - y)
        g60 = jnp.matmul(
            jnp.matmul(a.T, g), b, preferred_element_type=jnp.float32
        )                                                        # A^T g B
        gu = (g60.reshape(1, shot * h * w) @ flat)[0]            # (C,)
        return acc + gu, None

    acc, _ = jax.lax.scan(step, jnp.zeros_like(u0), None, length=num_steps)
    return jnp.stack([w_init[0] + lr * acc, w_init[1] - lr * acc], axis=0)
