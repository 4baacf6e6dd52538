"""Jit-compiled episodic engine: eval episodes and CWT meta-training steps.

Orchestrates the stage-2 pipeline of the reference (src/train.py:166-288,
src/test.py:103-254) as pure jitted functions:

  backbone features (frozen)  ->  fused inner-loop classifier adaptation
  ->  CWT weight update  ->  query prediction  ->  loss / IoU

Episodes are a pytree batch with static shapes::

    {"s_img":  (E, shot, H, W, 3) float32,   # support images (normalized)
     "s_label":(E, shot, H, W)    int32,     # {0,1,255}; padded shots all-255
     "q_img":  (E, H, W, 3)       float32,
     "q_label":(E, H, W)          int32,
     "cls":    (E,)               int32}     # episode class id (bookkeeping)

Everything is vmapped over E and jitted once; sharding the E axis over a
``Mesh`` data axis scales to multi-chip (see parallel.mesh). The reference's
per-episode host syncs (numpy pixel counting, fresh torch modules, Python
optimizer steps) have no equivalent here — one device program per batch.

Faithfulness notes:
* the reference extracts *support* features in train() mode during
  meta-training (dropout active; src/train.py:219 runs before model.eval() at
  :245) while query features use eval mode — replicated via the
  ``support_dropout`` flag;
* query features are L2-normalized over channels before both the CWT update
  and the prediction (src/train.py:250,259; src/test.py:194-204);
* the query CE uses per-episode dynamic weights [1, n_bg/(n_fg+1e-12)]
  (src/train.py:237-243).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.cwt import build_cwt
from ..models.pspnet import (apply_classifier, build_pspnet, cast_backbone_io,
                             init_classifier_weights, stage_dtype_policy)
from ..ops.losses import (binary_weighted_ce_from_diff, class_balance_weights,
                          weighted_cross_entropy)
from ..ops.metrics import intersection_and_union
from ..ops.resize import upsample_bilinear_ac


def l2_normalize_channels(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(dim=channel) over the trailing channel axis."""
    norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    return (x / jnp.maximum(norm, eps)).astype(x.dtype)


class EpisodicEngine:
    """Builds and caches the jitted episodic programs for a given config."""

    def __init__(self, cfg, backbone=None, cwt=None):
        self.cfg = cfg
        self.backbone = backbone if backbone is not None else build_pspnet(cfg)
        self.cwt = cwt if cwt is not None else build_cwt(cfg)
        self.num_classes = cfg.num_classes_tr
        self.adapt_iter = cfg.adapt_iter
        self.cls_lr = cfg.cls_lr
        self.image_size = cfg.image_size
        self.bottleneck_dim = cfg.bottleneck_dim
        # bf16 backbone compute (the FLOP-dominant stage); episodic math
        # (inner loop, CWT, losses, metrics) stays f32 for mIoU parity.
        # stage_policy additionally supports MIXED per-stage dtypes
        # (cfg.bf16_stages) so the precision cost can be localized.
        self.stage_policy = stage_dtype_policy(cfg)
        dts = set(self.stage_policy.values())
        self.compute_dtype = jnp.bfloat16 if dts == {jnp.bfloat16} else jnp.float32
        self._mixed_policy = len(dts) > 1

    def _cast_backbone_inputs(self, vars_b, imgs):
        return cast_backbone_io(self.stage_policy, vars_b, imgs)

    # ------------------------------------------------------------------ #
    # single-episode programs
    # ------------------------------------------------------------------ #

    def _episode_features(self, vars_b, episode, support_dropout=False, rng=None):
        """Backbone features for an episode — ONE batched pass over support+query.

        Train path (support_dropout): the only train/eval difference in the
        frozen backbone is the bottleneck's channel dropout (BN stats frozen
        either way; reference runs support in train() mode, src/train.py:219,
        and query in eval mode, :245). Instead of two backbone dispatches,
        run the deterministic pipeline batched over shot+1 images and apply
        the equivalent channel-dropout mask (Bernoulli keep per (sample,
        channel), scaled 1/keep — exactly nn.Dropout(broadcast_dims=(-3,-2)))
        to the support rows only.
        """
        imgs = jnp.concatenate([episode["s_img"], episode["q_img"][None]], axis=0)
        vars_c, imgs = self._cast_backbone_inputs(vars_b, imgs)
        feat, _ = self.backbone.apply(
            vars_c, imgs, train=False,
            method=self.backbone.extract_features, mutable=False,
        )
        feat = feat.astype(jnp.float32)
        f_s, f_q = feat[:-1], feat[-1:]
        if support_dropout and rng is not None:
            rate = float(self.cfg.dropout)
            if rate > 0.0:
                keep = jax.random.bernoulli(
                    rng, 1.0 - rate, (f_s.shape[0], 1, 1, f_s.shape[-1])
                )
                f_s = jnp.where(keep, f_s / (1.0 - rate), 0.0)
        return f_s, f_q

    def eval_episode(self, vars_b, vars_t, episode, rng) -> Dict[str, jnp.ndarray]:
        """Inner loop + CWT update + query logits (no grad), one episode."""
        w0 = init_classifier_weights(rng, self.num_classes, self.bottleneck_dim)
        return self.eval_episode_from_w0(vars_b, vars_t, episode, w0)

    def _adapted_episode(self, vars_b, episode, w0):
        """Shared eval prologue: features + inner-loop-adapted classifier."""
        f_s, f_q = self._episode_features(vars_b, episode)
        w = jax.lax.stop_gradient(
            _adapt(f_s, episode["s_label"], w0, self.adapt_iter, self.cls_lr)
        )
        return f_q, w

    def _upsampled_metrics(self, pred, q_label):
        """align-corners upsample -> argmax I/U + unweighted CE (src:214-230)."""
        size = q_label.shape[-2:]
        if self.num_classes == 2:
            # K=2 fast tail: upsampling is linear and argmax/CE depend only
            # on the logit DIFFERENCE, so run the whole 473px tail on ONE
            # (H, W) plane — half the upsample, full VPU lanes everywhere.
            # Ties: argmax picks the first max (class 0) <=> d > 0 exactly.
            d = self._upsampled_diff(pred, size)
            inter, union, _ = intersection_and_union(
                (d > 0).astype(jnp.int32), q_label, 2
            )
            ones = jnp.ones((2,), jnp.float32)
            return inter, union, binary_weighted_ce_from_diff(d, q_label, ones)
        logits = upsample_bilinear_ac(pred[None].astype(jnp.float32), size)[0]
        inter, union, _ = intersection_and_union(
            jnp.argmax(logits, -1), q_label, self.num_classes
        )
        ones = jnp.ones((self.num_classes,), jnp.float32)
        return inter, union, weighted_cross_entropy(logits, q_label, ones)

    def _upsampled_diff(self, pred, size):
        """(h, w, 2) feature-res logits -> upsampled (H, W) difference plane."""
        d = (pred[..., 1] - pred[..., 0]).astype(jnp.float32)
        return upsample_bilinear_ac(d[None, ..., None], size)[0, ..., 0]

    def eval_episode_from_w0(self, vars_b, vars_t, episode, w0) -> Dict[str, jnp.ndarray]:
        """Same as eval_episode but with injected initial classifier weights."""
        f_q, w = self._adapted_episode(vars_b, episode, w0)
        pred_q0 = apply_classifier(w, f_q)[0]          # (h, w, K) raw-classifier logits
        f_qn = l2_normalize_channels(f_q)
        w_upd = self.cwt.apply(vars_t, w[None], f_qn, f_qn, deterministic=True)[0]
        pred_q = apply_classifier(w_upd, f_qn)[0]      # (h, w, K)
        return {"pred_q": pred_q, "pred_q0": pred_q0, "cls": episode["cls"]}

    def train_episode_loss(self, trans_params, vars_t_extra, vars_b, episode, rng,
                           with_metrics: bool = True):
        """Per-episode transformer loss (support dropout + attn dropout live).

        ``with_metrics=False`` skips the IoU tail (the 473px argmax/IU passes
        for both predictions plus the second upsample) — the train loops only
        read metrics every 10th step, so the hot steps need loss+grads only.
        """
        rng_drop_s, rng_w, rng_attn = jax.random.split(rng, 3)
        f_s, f_q = self._episode_features(
            vars_b, episode, support_dropout=True, rng=rng_drop_s
        )
        w0 = init_classifier_weights(rng_w, self.num_classes, self.bottleneck_dim)
        w = jax.lax.stop_gradient(
            _adapt(f_s, episode["s_label"], w0, self.adapt_iter, self.cls_lr)
        )
        pred_q0 = apply_classifier(w, f_q)[0]
        f_qn = jax.lax.stop_gradient(l2_normalize_channels(f_q))

        vars_t = dict(vars_t_extra)
        vars_t["params"] = trans_params
        w_upd = self.cwt.apply(
            vars_t, w[None], f_qn, f_qn, deterministic=False,
            rngs={"dropout": rng_attn},
        )[0]
        logits60 = apply_classifier(w_upd, f_qn)    # (1, h, w, K)
        q_label = episode["q_label"]
        size = q_label.shape[-2:]
        qw = class_balance_weights(q_label, num_classes=self.num_classes)
        if self.num_classes == 2:
            # single-plane 473px tail (see _upsampled_metrics); the gradient
            # through the diff is identical to the two-logit CE gradient
            d = self._upsampled_diff(logits60[0], size)
            loss = binary_weighted_ce_from_diff(d, q_label, qw)
        else:
            logits = upsample_bilinear_ac(logits60, size)[0]
            loss = weighted_cross_entropy(logits, q_label, qw)

        if not with_metrics:
            return loss, {}

        # train metrics (fg/bg IoU of transformed and raw predictions)
        inter, union, _ = self._upsampled_metrics(logits60[0], q_label)
        inter0, union0, _ = self._upsampled_metrics(pred_q0, q_label)
        metrics = {"inter": inter, "union": union, "inter0": inter0, "union0": union0}
        return loss, metrics

    def eval_episode_metrics(self, vars_b, vars_t, episode, rng,
                             with_pred: bool = False) -> Dict[str, jnp.ndarray]:
        """eval_episode + on-device metrics (matches src/test.py:214-230).

        Logits are upsampled to label resolution with align_corners bilinear
        before argmax; per-class (intersection, union) is returned for both
        the transformed (pred_q) and raw (pred_q0) classifiers, along with the
        unweighted CE loss of the transformed prediction. ``with_pred`` adds
        the feature-resolution argmax map (one program yields metrics AND
        predictions — the dtype A/B harness needs both).
        """
        out = self.eval_episode(vars_b, vars_t, episode, rng)
        q_label = episode["q_label"]
        inter, union, loss = self._upsampled_metrics(out["pred_q"], q_label)
        inter0, union0, loss0 = self._upsampled_metrics(out["pred_q0"], q_label)
        result = {
            "inter": inter, "union": union,
            "inter0": inter0, "union0": union0,
            "loss": loss, "loss0": loss0, "cls": episode["cls"],
        }
        if with_pred:
            result["pred_lab"] = jnp.argmax(out["pred_q"], -1).astype(jnp.int32)
        return result

    def serve_episode(self, vars_b, vars_t, episode, rng) -> jnp.ndarray:
        """Label-free inference: episode -> (H, W) int32 query mask.

        The serving surface (no q_label, no metrics): inner loop + CWT weight
        transform + align-corners upsample + argmax at image resolution —
        what a deployed predictor returns (reference's prediction tail,
        src/test.py:200-223, without the scoring). Used by
        tools/export_serve to build the AOT artifact.
        """
        w0 = init_classifier_weights(rng, self.num_classes, self.bottleneck_dim)
        f_q, w = self._adapted_episode(vars_b, episode, w0)
        f_qn = l2_normalize_channels(f_q)
        w_upd = self.cwt.apply(vars_t, w[None], f_qn, f_qn, deterministic=True)[0]
        pred_q = apply_classifier(w_upd, f_qn)[0]
        size = episode["q_img"].shape[-3:-1]
        if self.num_classes == 2:
            d = self._upsampled_diff(pred_q, size)
            return (d > 0).astype(jnp.int32)
        logits = upsample_bilinear_ac(pred_q[None].astype(jnp.float32), size)[0]
        return jnp.argmax(logits, -1).astype(jnp.int32)

    def eval_episode_metrics_no_cwt(self, vars_b, episode, rng) -> Dict[str, jnp.ndarray]:
        """Inner loop + raw-classifier metrics only — no transformer.

        Stage-1/pretrain QA path: the reference's episodic_validate
        (src/test.py:257-371) has no transformer at all; scoring stops at the
        adapted inner-loop classifier. Skipping the CWT forward removes pure
        wasted compute from the hottest validation loop.
        """
        w0 = init_classifier_weights(rng, self.num_classes, self.bottleneck_dim)
        f_q, w = self._adapted_episode(vars_b, episode, w0)
        pred_q0 = apply_classifier(w, f_q)[0]
        inter0, union0, loss0 = self._upsampled_metrics(pred_q0, episode["q_label"])
        return {"inter0": inter0, "union0": union0, "loss0": loss0,
                "cls": episode["cls"]}

    # ------------------------------------------------------------------ #
    # batched jitted programs
    # ------------------------------------------------------------------ #

    @functools.cached_property
    def eval_metrics_batch_no_cwt(self):
        """jit(vmap(eval_episode_metrics_no_cwt)): CWT-free stage-1 validation."""
        fn = jax.vmap(self.eval_episode_metrics_no_cwt, in_axes=(None, 0, 0))
        return jax.jit(fn)

    @functools.cached_property
    def eval_metrics_batch(self):
        """jit(vmap(eval_episode_metrics)): only tiny metric arrays leave device."""
        fn = jax.vmap(self.eval_episode_metrics, in_axes=(None, None, 0, 0))
        return jax.jit(fn)

    @functools.cached_property
    def eval_metrics_batch_pred(self):
        """eval_metrics_batch variant that also returns the argmax maps."""
        fn = jax.vmap(
            functools.partial(self.eval_episode_metrics, with_pred=True),
            in_axes=(None, None, 0, 0),
        )
        return jax.jit(fn)

    @functools.cached_property
    def eval_batch(self):
        """jit(vmap(eval_episode)): (vars_b, vars_t, batch, rngs(E,)) -> preds."""
        fn = jax.vmap(self.eval_episode, in_axes=(None, None, 0, 0))
        return jax.jit(fn)

    @functools.cached_property
    def serve_batch(self):
        """jit(vmap(serve_episode)): batched label-free mask prediction."""
        fn = jax.vmap(self.serve_episode, in_axes=(None, None, 0, 0))
        return jax.jit(fn)

    def make_train_step(self, optimizer: optax.GradientTransformation,
                        with_metrics: bool = True):
        """Returns jitted (trans_params, opt_state, vars_t_extra, vars_b, batch, rng)
        -> (new_params, new_opt_state, metrics).

        ``with_metrics=False`` compiles the loss-only step (no IoU tail);
        metrics then carries just ``loss``."""

        def batched_loss(trans_params, vars_t_extra, vars_b, batch, rngs):
            losses, metrics = jax.vmap(
                functools.partial(self.train_episode_loss,
                                  with_metrics=with_metrics),
                in_axes=(None, None, None, 0, 0),
            )(trans_params, vars_t_extra, vars_b, batch, rngs)
            return jnp.mean(losses), metrics

        grad_fn = jax.value_and_grad(batched_loss, has_aux=True)

        @jax.jit
        def step(trans_params, opt_state, vars_t_extra, vars_b, batch, rng):
            e = batch["q_label"].shape[0]
            rngs = jax.random.split(rng, e)
            (loss, metrics), grads = grad_fn(
                trans_params, vars_t_extra, vars_b, batch, rngs
            )
            updates, opt_state = optimizer.update(grads, opt_state, trans_params)
            trans_params = optax.apply_updates(trans_params, updates)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return trans_params, opt_state, metrics

        return step


def _adapt(f_s, s_label, w0, num_steps, lr):
    from .inner_loop import adapt_classifier

    return adapt_classifier(f_s, s_label, w0, num_steps=num_steps, lr=lr)


