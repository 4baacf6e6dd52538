"""Incremental multi-way episodic training (CCA): base classes + one novel class.

Parity targets (reference: src/train_cca.py:100-200, src/train_cca1.py):

* the episodic classifier is K-way (num_classes_tr, e.g. 16): base rows are
  re-seeded from the stage-1 pretrained classifier and the novel class slot
  (the episode's fold-local id ``subcls``) is randomly re-initialized
  (reset_cls_wt, src/model/model_util.py:112-117);
* support BG pixels are pseudo-labeled with the base classifier's argmax
  (novel logit suppressed; reset_spt_label, src:119-127);
* the inner loop optimizes Adapt_SegLoss — CE with weight (bg/fg)^tp on the
  novel class (src/model/pspnet.py:207-221);
* query predictions are compressed to binary foreground-vs-rest
  probabilities before the loss and metrics (compress_pred, src:158-166).

train_cca1's episode-adaptive class growth (src/model/model_util.py:130-155)
is data-dependent, so it runs with a host-side label pass per episode batch.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.pspnet import (apply_classifier, effective_classifier_weight,
                             init_classifier_weights)
from ..ops.episode_utils import compress_pred, reset_spt_label
from ..ops.losses import class_balance_weights, cross_entropy, seg_loss
from ..ops.metrics import intersection_and_union
from ..ops.resize import upsample_bilinear_ac
from .heads import HeadEngine
from .inner_loop import adapt_classifier


class CCAEngine(HeadEngine):
    """MMN head over an incremental K-way episodic classifier."""

    def __init__(self, cfg, adaptive: bool = False):
        super().__init__(cfg, "mmn")
        self.adaptive = adaptive
        self.tp = float(cfg.get("tp", 1.0))

    # -------------------------------------------------------------- #

    def episode_parts(self, vars_b, episode, rng, s_label_override=None):
        cfg = self.cfg
        imgs = jnp.concatenate([episode["s_img"], episode["q_img"][None]], axis=0)
        if self._cast_backbone:  # use_amp parity (src/train_cca.py autocast)
            from ..models.pspnet import cast_backbone_io

            vars_b, imgs = cast_backbone_io(self.stage_policy, vars_b, imgs)
        feat, feats = self.backbone.apply(
            vars_b, imgs, train=False,
            method=self.backbone.extract_features, mutable=False,
        )
        if self._cast_backbone:
            feat = feat.astype(jnp.float32)
            feats = jax.tree.map(lambda t: t.astype(jnp.float32), feats)
        f_s, f_q = feat[:-1], feat[-1:]
        fs_feats = jax.tree.map(lambda t: t[:-1], feats)
        fq_feats = jax.tree.map(lambda t: t[-1:], feats)
        subcls = episode["cls"]

        # K-way classifier: base rows from the pretrained head, novel row fresh
        pre_w = effective_classifier_weight(vars_b["params"])  # (K, C)
        k = pre_w.shape[0]
        rng_row, rng_rest = jax.random.split(rng)
        new_row = init_classifier_weights(rng_row, 1, cfg.bottleneck_dim)[0]
        w0 = pre_w.at[subcls].set(new_row)

        row_mask = None
        if self.adaptive:
            # cca1: labels/classifier were rewritten by the host-side pass —
            # foreground is class 1, inherited base rows start at 2, unused
            # rows are masked out of the softmax (the reference builds a
            # literally narrower classifier per episode)
            s_label = episode["s_label"]
            w0 = episode["w0"]
            row_mask = episode["row_mask"]
            fg_idx = 1
        elif s_label_override is not None:
            s_label = s_label_override
            fg_idx = subcls
        else:
            # pseudo-label support BG with base classes (novel logit suppressed)
            base_logits = apply_classifier(pre_w, f_s)
            base_logits = upsample_bilinear_ac(
                base_logits, episode["s_label"].shape[-2:]
            )
            s_label = reset_spt_label(episode["s_label"], base_logits, subcls)
            fg_idx = subcls

        cls_weights = class_balance_weights(
            s_label, num_classes=k, fg_idx=fg_idx, tp=self.tp
        )
        w = jax.lax.stop_gradient(
            adapt_classifier(f_s, s_label, w0, num_steps=cfg.adapt_iter,
                             lr=cfg.cls_lr, cls_weights=cls_weights,
                             row_mask=row_mask)
        )

        parts = dict(f_s=f_s, f_q=f_q, fs_feats=fs_feats, fq_feats=fq_feats,
                     w=w, subcls=subcls,
                     fg_idx=jnp.asarray(1 if self.adaptive else subcls))
        if row_mask is not None:
            parts["row_mask"] = row_mask
        parts["pd_q0"] = self._masked_cls(parts, f_q)
        parts["pd_s"] = self._masked_cls(parts, f_s)
        return parts

    @staticmethod
    def _masked_cls(parts, feat):
        """Classifier logits with unused rows removed from the softmax."""
        logits = apply_classifier(parts["w"], feat)
        row_mask = parts.get("row_mask")
        if row_mask is not None:
            logits = jnp.where(row_mask[None, None, None, :], logits, -1e9)
        return logits

    # -------------------------------------------------------------- #

    def train_episode_loss(self, trainables, vars_b, episode, rng,
                           frozen_vars=None, det: bool = False):
        cfg = self.cfg
        rng_w, rng_head = jax.random.split(rng)
        parts = self.episode_parts(vars_b, episode, rng_w)
        fg_idx = parts["fg_idx"]
        q_label = episode["q_label"]
        # NOTE reference-exact wart: for CE loss types, seg_loss applies
        # log_softmax to these compress_pred PROBABILITIES — exactly what the
        # torch reference does (weighted_ce_loss runs nn.CrossEntropyLoss on
        # the 'pb' input too, model_util.py:27-37 via train_cca.py:182-188;
        # only the dice branch honors input_type). The shipped CCA configs
        # use loss_type wt_dc, where 'pb' is handled correctly.
        crit = lambda probs: seg_loss(
            probs, q_label, loss_type=cfg.get("loss_type", "wt_ce"), input_type="pb"
        )

        # per-shot scanned MMN readout (bounds k-shot volume activations;
        # see HeadEngine._mmn_att_shots); the MMN head needs no whole-loss
        # remat on top by default, but an explicit `remat_head True` still
        # forces the checkpoint (head_remat_default honors the override)
        def head_fwd(hv, fq_feats, fs_feats, f_q, f_s, rng_h):
            att_shots = self._mmn_att_shots(
                {"params": hv}, fq_feats, fs_feats, f_q, f_s, rng_h, det)
            # MMN's internal mean is over ALL shots (reference parity)
            att_fq = jnp.mean(att_shots, axis=0, keepdims=True)
            return None, att_fq, att_shots

        from .heads import head_remat_default

        if head_remat_default(cfg, self.head_type) and not det:
            head_fwd = jax.checkpoint(head_fwd)
        loss_train, fq_feats, fs_feats = trainables, parts["fq_feats"], parts["fs_feats"]
        f_q_in, f_s_in = parts["f_q"], parts["f_s"]
        if cfg.get("use_amp", False) and not det:
            # bf16 head compute (torch autocast analog; see HeadEngine) —
            # _up's f32 cast keeps compress_pred/losses/metrics full precision
            amp_cast = lambda tree: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                tree,
            )
            loss_train, fq_feats, fs_feats, f_q_in, f_s_in = map(
                amp_cast, (trainables, fq_feats, fs_feats, f_q_in, f_s_in))
        _, att_fq, att_shots = head_fwd(
            loss_train, fq_feats, fs_feats, f_q_in, f_s_in, rng_head,
        )
        att_fq = att_fq.astype(jnp.float32)
        att_shots = att_shots.astype(jnp.float32)
        fq_blend = parts["f_q"] * (1 - cfg.att_wt) + att_fq * cfg.att_wt

        def binary_up(feat):
            logits = self._masked_cls(parts, feat)
            return compress_pred(self._up(logits), fg_idx, "lg")

        pred0 = binary_up(parts["f_q"])[0]
        pred1 = binary_up(att_fq)[0]
        pred = binary_up(fq_blend)[0]

        if cfg.get("loss_shot", "avg") == "sum":
            per_shot = binary_up(att_shots)
            loss1 = sum(crit(per_shot[s]) for s in range(per_shot.shape[0]))
        else:
            loss1 = crit(pred1)
        aux = cfg.get("aux", False)
        loss = loss1 + (aux * crit(pred) if aux else 0.0)

        metrics = {"loss": loss}
        for name, p in (("0", pred0), ("1", pred1), ("", pred)):
            inter, union, _ = intersection_and_union(
                jnp.argmax(p, -1), q_label, 2
            )
            metrics[f"inter{name}"] = inter
            metrics[f"union{name}"] = union
        return loss, metrics

    @functools.cached_property
    def eval_metrics_batch(self):
        def eval_one(trainables, vars_b, episode, rng, frozen_vars):
            loss, metrics = self.train_episode_loss(
                trainables, vars_b, episode, rng, frozen_vars, det=True
            )
            out = dict(metrics)
            out["cls"] = episode["cls"]
            return out

        # lax.map, not vmap: the rank-4 consensus route must not gain an
        # episode batch dim (rank-5 transposes get catastrophically padded
        # layouts on TPU — see HeadEngine.eval_metrics_batch)
        def fn(trainables, vars_b, batch, rngs, frozen_vars):
            return jax.lax.map(
                lambda er: eval_one(trainables, vars_b, er[0], er[1],
                                    frozen_vars),
                (batch, rngs))

        return jax.jit(fn)


def make_base_preds_fn(cfg, engine: CCAEngine):
    """Jitted once (per trainer, not per batch): base-classifier support preds."""

    @jax.jit
    def base_preds(vars_b, s_img):
        feat, _ = engine.backbone.apply(
            vars_b, s_img, train=False,
            method=engine.backbone.extract_features, mutable=False,
        )
        pre_w = effective_classifier_weight(vars_b["params"])
        logits = apply_classifier(pre_w, feat)
        return upsample_bilinear_ac(logits, (cfg.image_size, cfg.image_size))

    return base_preds


def adaptive_relabel_batch(cfg, engine: CCAEngine, vars_b, batch,
                           base_preds_fn, rng: np.random.Generator):
    """Host-side cca1 pass: episode-adaptive class growth (src/train_cca1.py:144).

    Per episode returns the rewritten labels plus the fresh per-episode
    classifier: rows 0/1 random (torch Conv2d init), rows 2..num_cls-1 the
    inherited base-class weights, remaining rows masked out of the softmax.
    """
    from ..ops.episode_utils import adapt_reset_spt_label_np

    e = batch["s_img"].shape[0]
    k = cfg.num_classes_tr
    c = cfg.bottleneck_dim
    pre_w = np.asarray(effective_classifier_weight(vars_b["params"]))
    bound = 1.0 / np.sqrt(c)

    labels, w0s, masks = [], [], []
    for i in range(e):
        preds = np.asarray(base_preds_fn(vars_b, batch["s_img"][i]))
        new_lab, cls_init_wt, num_cls = adapt_reset_spt_label_np(
            np.asarray(batch["s_label"][i]), preds, pre_w,
            cfg.num_classes_tr, sub_cls=int(batch["cls"][i]),
        )
        w0 = rng.uniform(-bound, bound, size=(k, c)).astype(np.float32)
        for j, wt in enumerate(cls_init_wt):
            w0[2 + j] = wt
        if cfg.get("load_bg", False):
            # seed the BG row from the base classifier (src/train_cca1.py:150-151)
            w0[0] = pre_w[0]
        mask = np.zeros(k, bool)
        mask[:num_cls] = True
        labels.append(new_lab)
        w0s.append(w0)
        masks.append(mask)
    out = dict(batch)
    out["s_label"] = np.stack(labels)
    out["w0"] = np.stack(w0s)
    out["row_mask"] = np.stack(masks)
    return out
