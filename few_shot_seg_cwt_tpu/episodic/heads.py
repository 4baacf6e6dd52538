"""Unified episodic engine for the extension heads (MMN/DeTr/Match/CHM/Att/Asy/Fuse).

Every variant trainer in the reference shares one skeleton (reference:
src/train_kshot.py:128-190, src/train_trans.py:118-175,
src/train_match.py:123-190, src/train_att.py:140-190, src/train_asy.py:130-170,
src/train_fuse.py:130-190, src/train_aug.py:140-215):

  frozen backbone features (support + query, with block-level taps)
  -> inner-loop adaptation of the episodic classifier
  -> head-specific refinement of the query feature
  -> classifier prediction(s) upsampled to 473
  -> query-balanced loss on the head's parameters only.

Here that skeleton is one jitted, vmap-able program parameterized by a
``head_type`` string; each head contributes a pure ``_loss_<head>`` branch.
All heads produce (loss, metrics{inter/union for pred0/pred1/pred}).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.att_zoo import build_attention_variant
from ..models.chm import CHMLearner
from ..models.detr import build_detr
from ..models.fusion import FuseNet1
from ..models.matching import MatchNet, block_remat_default
from ..models.mmn import build_mmn
from ..models.pspnet import apply_classifier, build_pspnet, init_classifier_weights
from ..ops.corr import get_corr
from ..ops.episode_utils import att_weighted_out, get_ig_mask, outer_forward
from ..ops.losses import class_balance_weights, cross_entropy, seg_loss, weighted_cross_entropy
from ..ops.metrics import intersection_and_union
from ..ops.resize import upsample_bilinear_ac
from .inner_loop import adapt_classifier

HEAD_TYPES = ("mmn", "detr", "match", "chm", "att", "asy", "fuse")


def head_remat_default(cfg, head_type: str) -> bool:
    """Whole-loss remat policy: cfg.remat_head wins; None means per-head.

    The NeighConsensus-based heads (mmn/match/fuse/detr — and the CCA
    engine, whose head is MMN) need no outer recompute: at 1-shot their
    473px train step fits single-chip HBM with NO checkpointing at all on
    the default rank-4 consensus route (13.7 GB fp32 at batch 4, measured
    round 4; per-block remat is a separate knob, `remat_blocks` ->
    models/matching.py block_remat_default, also off there). Dropping the
    redundant outer remat measured +34% in round 3 and dropping the block
    remat another ~15% in round 4. At shot > 1 the MMN volumes are bounded
    by the per-shot scan instead (_mmn_att_shots) — the whole-loss
    checkpoint neither helps nor is needed there. CHM's 4D/6D convolutions
    have no block-level remat and always keep the whole-loss checkpoint;
    att/asy hold no volume activations either way.
    """
    want = cfg.get("remat_head", None)
    if want is not None:
        return bool(want)
    return head_type == "chm"


def build_head(cfg, head_type: str):
    if head_type == "mmn":
        return build_mmn(cfg)
    if head_type == "detr":
        return build_detr(cfg)
    if head_type == "match":
        return MatchNet(temp=cfg.temp, cv_type=cfg.get("conv4d", "red"),
                        sce=bool(cfg.get("sce", False)), cyc=bool(cfg.get("cyc", False)),
                        sym_mode=True, in_channel=1,
                        block_remat=block_remat_default(
                            cfg, cfg.get("conv4d", "red")))
    if head_type == "chm":
        return CHMLearner(ktype=cfg.get("ktype", "psi"), feat_dim=cfg.backbone_dim,
                          temp=cfg.temp)
    if head_type == "att":
        return build_attention_variant(cfg)
    if head_type == "fuse":
        # pooled-correlation side: feature side through the stride-2 pivot conv
        feat_h = (cfg.image_size - 1) // 8 + 1
        return FuseNet1(im_size=(feat_h - 1) // 2 + 1, mid_dim=256)
    if head_type == "asy":
        return None  # trains only the backbone's gamma scalar
    raise ValueError(f"unknown head {head_type}")


class HeadEngine:
    """Jitted episodic programs for a given extension head."""

    def __init__(self, cfg, head_type: str, frozen_match: Optional[MatchNet] = None):
        assert head_type in HEAD_TYPES
        if head_type in ("detr", "match", "chm") and int(cfg.shot) > 1:
            # same limitation as the reference: its get_corr views k with q's
            # batch (model_util.py:101-109), so DeTr/MatchNet/CHM only ever
            # run the 1-shot protocol (train_trans/train_match are 1-shot);
            # fail with a clear message instead of an einsum shape error
            raise ValueError(
                f"head '{head_type}' supports shot=1 only (got shot={cfg.shot});"
                " use the mmn head for k-shot episodes"
            )
        self.cfg = cfg
        self.head_type = head_type
        self.backbone = build_pspnet(cfg)
        # the reference's AMP wraps these trainers' forward (use_amp,
        # src/train_kshot.py:146-190) — map it to the same backbone dtype
        # policy the CWT engine uses (incl. mixed bf16_stages, whose
        # activation casts build_pspnet already installed); head math stays f32
        from ..models.pspnet import policy_is_noop, stage_dtype_policy

        self.stage_policy = stage_dtype_policy(cfg)
        self._cast_backbone = not policy_is_noop(self.stage_policy)
        self.head = build_head(cfg, head_type)
        # train_fuse consumes a *frozen pretrained* MatchNet (src/train_fuse.py:100)
        self.frozen_match = frozen_match or (
            MatchNet(temp=cfg.temp, cv_type="red", in_channel=1)
            if head_type == "fuse" else None
        )
        self.num_classes = cfg.num_classes_tr
        self.image_size = cfg.image_size

    # ------------------------------------------------------------------ #

    def episode_parts(self, vars_b, episode, rng):
        """Backbone features, adapted classifier, raw preds — shared prologue."""
        cfg = self.cfg
        imgs = jnp.concatenate([episode["s_img"], episode["q_img"][None]], axis=0)
        if self._cast_backbone:
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

        w0 = init_classifier_weights(rng, self.num_classes, cfg.bottleneck_dim)
        w = jax.lax.stop_gradient(
            adapt_classifier(f_s, episode["s_label"], w0,
                             num_steps=cfg.adapt_iter, lr=cfg.cls_lr)
        )
        pd_q0 = apply_classifier(w, f_q)          # (1, h, w, K)
        pd_s = apply_classifier(w, f_s)           # (shot, h, w, K)
        # per-shot validity: random_shot pads whole shots with all-255 labels
        # (data/episodic.py); real supports always have FG (>=2048 px filter).
        # The inner loop zero-weights pads already; the k-shot heads must
        # exclude them from attention/averaging too (the reference loops over
        # the true shot count instead, src/train_kshot.py:159-180).
        s_valid = jnp.any(episode["s_label"] != 255, axis=(-2, -1)).astype(jnp.float32)
        return dict(f_s=f_s, f_q=f_q, fs_feats=fs_feats, fq_feats=fq_feats,
                    w=w, pd_q0=pd_q0, pd_s=pd_s, s_valid=s_valid)

    def _up(self, logits: jnp.ndarray) -> jnp.ndarray:
        # f32 here is the AMP boundary: under use_amp the head convs run
        # bf16, but upsample/softmax/CE/metrics stay f32 — the same op split
        # torch.cuda.amp.autocast applies (interpolate and losses fp32)
        return upsample_bilinear_ac(
            logits.astype(jnp.float32), (self.image_size, self.image_size))

    def _cls_up(self, w, feat) -> jnp.ndarray:
        return self._up(apply_classifier(w, feat))

    # ------------------------------------------------------------------ #
    # head-specific losses; all return (loss, {"pred1": ..., "pred": ...})
    # ------------------------------------------------------------------ #

    def _select_support_stream(self, parts, episode):
        """train_aug att_type: choose original/augmented/adaptive support views.

        With meta_aug=2 the support axis interleaves [org_0, aug_0, org_1, ...]
        (reference tensor_slice, src/util.py:20-29): att_type 0 keeps the
        originals, 1 the augmented views, 3 picks per pair whichever view the
        adapted classifier segments better (IoU of pd_s vs s_label,
        src/train_aug.py:148-158). Other values use every view.
        """
        cfg = self.cfg
        att_type = cfg.get("att_type", 2)
        if cfg.get("meta_aug", 0) <= 1 or att_type not in (0, 1, 3):
            return parts
        f_s = parts["f_s"]
        n = f_s.shape[0]
        pairs = n // 2
        take_feats = lambda sel: jax.tree.map(
            lambda t: t[sel] if t.shape[0] == n else t, parts["fs_feats"]
        )
        if att_type in (0, 1):
            sel = jnp.arange(pairs) * 2 + att_type
        else:
            # adaptive: mean FG/BG IoU of the adapted classifier on each view
            logits = upsample_bilinear_ac(
                parts["pd_s"], episode["s_label"].shape[-2:]
            )
            inter, union, _ = jax.vmap(
                lambda p, t: intersection_and_union(p, t, self.num_classes)
            )(jnp.argmax(logits, -1), episode["s_label"])
            iou = jnp.mean(inter / (union + 1e-10), axis=-1).reshape(pairs, 2)
            best = jnp.argmax(iou, axis=-1)                  # (pairs,)
            sel = jnp.arange(pairs) * 2 + best
        out = dict(parts)
        out["f_s"] = f_s[sel]
        out["fs_feats"] = take_feats(sel)
        out["pd_s"] = parts["pd_s"][sel]
        out["s_valid"] = parts["s_valid"][sel]
        return out

    def _mmn_att_shots(self, head_vars, fq_feats, fs_feats, f_q, f_s,
                       rng, det):
        """Per-shot MMN attention readouts, (shot, h, w, C).

        shot == 1: one batched apply. shot > 1: a sequential ``lax.map``
        over the shot axis with per-shot rematerialization — the
        reference's per-shot Python loop (src/train_kshot.py:159-180) as a
        compiled scan. Shot-batching the backward instead demands HBM
        proportional to the shot count (measured 67 GB at 5-shot 473px,
        with or without a whole-loss checkpoint); the scan bounds the
        (h,w,hs,ws,10) correlation-volume activations to ONE shot's worth.
        """

        def apply_one(fs_feats_k, f_s_k, rng_k, fq_prepped=None):
            _, _, att = self.head.apply(
                head_vars, fq_feats, fs_feats_k, f_q, f_s_k, ret_shots=True,
                deterministic=det, rngs=None if det else {"dropout": rng_k},
                fq_prepped=fq_prepped,
            )
            return att

        shot = f_s.shape[0]
        if shot == 1:
            return apply_one(fs_feats, f_s, rng)

        # shot_hoist_query (default True): the query-side rd/WeightAverage
        # prep does not depend on the shot — compute it ONCE outside the
        # per-shot map instead of 2 x shot times (forward + checkpoint
        # recompute). Math is identical in deterministic mode (tested);
        # in training the query branch draws ONE shared dropout mask
        # instead of the reference's per-shot redraws
        # (src/train_kshot.py:159-180 re-runs the whole model per shot) —
        # same expectation, different noise correlation. Measured +13%
        # on the 5-shot amp train step (1.348 -> 1.529 eps/s, closing the
        # round-5 gap to linear 1-shot scaling; BENCH.md round-5
        # "5-shot query-prep hoist"). Set shot_hoist_query False for the
        # reference's exact per-shot dropout draws.
        fq_prepped = None
        if (self.cfg.get("shot_hoist_query", True)
                and hasattr(type(self.head), "prep_query")):
            rng_prep, rng = (None, rng) if det else jax.random.split(rng)
            fq_prepped = self.head.apply(
                head_vars, fq_feats, deterministic=det,
                rngs=None if det else {"dropout": rng_prep},
                method="prep_query",
            )

        # shot_native: run every shot through ONE head apply — the rank-4
        # consensus route carries the shot axis as the conv batch dim B, so
        # the tensors stay rank-4 (no vmap => no rank-5 transposes and none
        # of their catastrophic TPU layout padding) and the per-shot
        # lax.map's jax.checkpoint recompute (one extra consensus forward
        # per shot) disappears. The price is shot x the consensus-stack
        # activation memory held for the backward.
        if self.cfg.get("shot_native", False):
            return apply_one(fs_feats, f_s, rng, fq_prepped)

        def one(args):
            fs_k, f_s_k, rng_k = args
            return apply_one(jax.tree.map(lambda t: t[None], fs_k),
                             f_s_k[None], rng_k, fq_prepped)[0]

        rngs = jax.random.split(rng, shot)
        # shot_tile > 1 processes the scan in vmapped CHUNKS of that many
        # shots (lax.map batch_size): activation memory scales by the tile
        # while the chain shortens by it — the dial between the fully
        # sequential reference loop (tile 1) and the 67-GB fully shot-batched
        # backward that does not fit at 473px. The tile must divide the shot
        # count (lax.map would otherwise add a ragged remainder program).
        tile = int(self.cfg.get("shot_tile", 1) or 1)
        # shot_remat (default True) checkpoints each mapped shot, bounding
        # live activations to ONE shot's consensus stack at the price of one
        # recomputed forward per shot in the backward (~17 ms/shot bf16 at
        # 473px — the measured 13% gap to linear 1-shot scaling, BENCH.md
        # round-5 "5-shot memory/recompute matrix"). False trades shot x
        # activation memory for that recompute — measured 23.2 GB at 473px
        # 5-shot at ANY episode batch (the buffers are per-episode), i.e.
        # it only fits at sub-protocol sizes; it changes math not at all.
        ck = (lambda f: jax.checkpoint(f)) \
            if self.cfg.get("shot_remat", True) else (lambda f: f)
        if tile > 1 and shot % tile == 0:
            return jax.lax.map(ck(one), (fs_feats, f_s, rngs),
                               batch_size=tile)
        return jax.lax.map(ck(one), (fs_feats, f_s, rngs))

    def _loss_mmn(self, head_vars, parts, episode, rng, det=False):
        cfg = self.cfg
        parts = self._select_support_stream(parts, episode)
        crit = lambda lg: seg_loss(lg, episode["q_label"], loss_type=cfg.get("loss_type", "wt_ce"))
        att_shots = self._mmn_att_shots(
            head_vars, parts["fq_feats"], parts["fs_feats"], parts["f_q"],
            parts["f_s"], rng, det,
        )
        # average the per-shot readouts over VALID shots only (random_shot
        # pads must not enter the mean; reference averages the true shots,
        # src/train_kshot.py:170-174)
        valid = parts["s_valid"]
        att_fq = (
            jnp.sum(att_shots * valid[:, None, None, None], axis=0, keepdims=True)
            / jnp.maximum(jnp.sum(valid), 1.0)
        )
        fq_blend = parts["f_q"] * (1 - cfg.att_wt) + att_fq * cfg.att_wt
        pred1 = self._cls_up(parts["w"], att_fq)[0]
        pred = self._cls_up(parts["w"], fq_blend)[0]
        if cfg.get("loss_shot", "avg") == "sum":
            per_shot = self._cls_up(parts["w"], att_shots)
            loss1 = sum(valid[k] * crit(per_shot[k])
                        for k in range(per_shot.shape[0]))
        else:
            loss1 = crit(pred1)
        aux = cfg.get("aux", False)
        loss = loss1 + (aux * crit(pred) if aux else 0.0)
        return loss, {"pred1": pred1, "pred": pred}

    def _loss_detr(self, head_vars, parts, episode, rng, det=False):
        cfg = self.cfg
        qw = class_balance_weights(episode["q_label"], self.num_classes)
        crit = lambda lg: weighted_cross_entropy(lg, episode["q_label"], qw)
        fq_out, sa_fq, ca_fq = self.head.apply(
            head_vars, parts["fq_feats"], parts["fs_feats"], parts["f_q"],
            parts["f_s"], deterministic=det,
            rngs=None if det else {"dropout": rng},
        )
        att_fq = sa_fq if cfg.get("sf_att", False) else ca_fq
        pred1 = self._cls_up(parts["w"], att_fq)[0]
        pred = self._cls_up(parts["w"], fq_out)[0]
        aux = cfg.get("aux", False)
        loss = crit(pred1) + (aux * crit(pred) if aux else 0.0)
        return loss, {"pred1": pred1, "pred": pred}

    def _stage_features(self, parts):
        stage = 4 if self.cfg.rmid in (None, "nr") else int(str(self.cfg.rmid)[-1])
        key = "nr" if self.cfg.rmid == "nr" else stage
        return parts["fq_feats"][key][-1], parts["fs_feats"][key][-1]

    def _loss_match(self, head_vars, parts, episode, rng, det=False):
        cfg = self.cfg
        qw = class_balance_weights(episode["q_label"], self.num_classes)
        crit = lambda lg: weighted_cross_entropy(lg, episode["q_label"], qw)
        fq_fea, fs_fea = self._stage_features(parts)
        # cycle-consistency and the ignore-mask re-readout are eval-only in the
        # reference: training hard-codes use_cyc=False (src/train_match.py:163)
        # while validation passes args.cyc / applies args.ignore (:318-322)
        wv, corr1 = self.head.apply(
            head_vars, fq_fea, fs_fea, parts["f_s"],
            s_mask=jnp.argmax(parts["pd_s"], -1), use_cyc=det,
            deterministic=det, ret_corr=True,
            rngs=None if det else {"dropout": rng},
        )
        if det and cfg.get("ignore", False):
            b, h, w, _ = parts["f_q"].shape
            sim = corr1.reshape(1, h * w, h * w)
            ig_mask = get_ig_mask(sim, episode["s_label"][:1],
                                  episode["q_label"][None],
                                  parts["pd_q0"], parts["pd_s"][:1])
            # the reference reads out over the QUERY feature here (v=f_q,
            # src/train_match.py:322) — replicated verbatim
            wv = att_weighted_out(sim, parts["f_q"], temp=cfg.temp,
                                  ig_mask=ig_mask)
        pred1 = self._cls_up(parts["w"], wv)[0]
        out = (wv * cfg.att_wt + parts["f_q"]) / (1 + cfg.att_wt)
        pred = self._cls_up(parts["w"], out)[0]
        loss1 = crit(pred1)
        if cfg.get("aux", False):
            loss1 = loss1 + _disagreement_loss(
                pred, self._up(parts["pd_q0"])[0], pred1, episode["q_label"]
            )
        return loss1, {"pred1": pred1, "pred": pred}

    def _loss_chm(self, head_vars, parts, episode, rng, det=False):
        cfg = self.cfg
        qw = class_balance_weights(episode["q_label"], self.num_classes)
        crit = lambda lg: weighted_cross_entropy(lg, episode["q_label"], qw)
        fq_fea, fs_fea = self._stage_features(parts)
        h = fq_fea.shape[1]
        fq_half = upsample_bilinear_ac(fq_fea, (h // 2, h // 2))
        fs_half = upsample_bilinear_ac(fs_fea, (h // 2, h // 2))
        wv = self.head.apply(head_vars, fq_half, fs_half, parts["f_s"])
        pred1 = self._cls_up(parts["w"], wv)[0]
        out = (wv * cfg.att_wt + parts["f_q"]) / (1 + cfg.att_wt)
        pred = self._cls_up(parts["w"], out)[0]
        return crit(pred1), {"pred1": pred1, "pred": pred}

    def _loss_att(self, head_vars, parts, episode, rng, det=False):
        cfg = self.cfg
        qw = class_balance_weights(episode["q_label"], self.num_classes)
        fq_fea, fs_fea = self._stage_features(parts)
        shot = fs_fea.shape[0]
        b, h, w, dk = fq_fea.shape
        sim = get_corr(fq_fea, fs_fea[:1])
        ig_mask = get_ig_mask(sim, episode["s_label"][:1], episode["q_label"][None],
                              parts["pd_q0"], parts["pd_s"][:1])
        valid = parts["s_valid"][:, None, None, None]
        # zero padded shots' k/v BEFORE the head: the ignore mask is a soft
        # -1000 logit bias (reference transformer.py:122-127), which only
        # hard-masks when logits stay << 1000 — true for real features, not
        # guaranteed for arbitrary pad content
        q = fq_fea.reshape(1, h * w, dk)
        k = (fs_fea * valid).reshape(1, shot * h * w, dk)
        v = (parts["f_s"] * valid).reshape(1, shot * h * w, -1)
        idt = parts["f_q"].reshape(1, h * w, -1)
        if shot > 1:  # tile the single-support ignore mask across shots
            ig_mask = jnp.tile(ig_mask, (1, shot))
            # and mask every pixel of padded shots out of the attention
            pad_pix = jnp.repeat(parts["s_valid"] < 0.5, h * w)[None, :]
            ig_mask = jnp.logical_or(ig_mask.astype(bool), pad_pix)
        upd, _ = self.head.apply(head_vars, k, v, q, idt, ig_mask,
                                 deterministic=det,
                                 rngs=None if det else {"dropout": rng})
        upd = upd.reshape(1, h, w, -1)
        pred = self._cls_up(parts["w"], upd)[0]
        return weighted_cross_entropy(pred, episode["q_label"], qw), {
            "pred1": pred, "pred": pred,
        }

    def _loss_asy(self, gamma, parts, episode, rng, det=False):
        cfg = self.cfg
        qw = class_balance_weights(episode["q_label"], self.num_classes)
        fq_fea, fs_fea = self._stage_features(parts)
        out, _, _ = outer_forward(
            parts["f_q"], parts["f_s"][:1], fq_fea, fs_fea[:1],
            episode["s_label"][:1], episode["q_label"][None],
            parts["pd_q0"], parts["pd_s"][:1], gamma,
            temp=cfg.temp, dist=cfg.get("dist", "dot"),
        )
        pred = self._cls_up(parts["w"], out)[0]
        return weighted_cross_entropy(pred, episode["q_label"], qw), {
            "pred1": pred, "pred": pred,
        }

    def _loss_fuse(self, head_vars, parts, episode, rng, frozen_vars, det=False):
        cfg = self.cfg
        fq_fea, fs_fea = self._stage_features(parts)
        b, h, w, _ = parts["f_q"].shape
        l_corr0 = get_corr(fq_fea[:1], fs_fea[:1]).reshape(1, h, w, h, w, 1)
        h_corr = get_corr(parts["f_q"], parts["f_s"][:1]).reshape(1, h, w, h, w)

        corr2d, wv = self.frozen_match.apply(
            frozen_vars, l_corr0, parts["f_s"][:1], ret_attn=True,
            method=self.frozen_match.corr_forward,
        )
        wv = jax.lax.stop_gradient(wv)
        l_corr = jax.lax.stop_gradient(corr2d.reshape(1, h, w, h, w))
        pd_q1 = apply_classifier(parts["w"], wv)
        pred1 = self._up(pd_q1)[0]
        pred0 = self._up(parts["pd_q0"])[0]

        im = self.head.im_size
        s_mask = jnp.where(episode["s_label"][:1] == 255, 0, episode["s_label"][:1])
        s_mask = upsample_bilinear_ac(s_mask[..., None].astype(jnp.float32), (im, im))
        wt = self.head.apply(
            head_vars, [l_corr, h_corr], s_mask,
            [jax.lax.stop_gradient(parts["pd_q0"]), jax.lax.stop_gradient(pd_q1)],
        )
        out = wv * wt[..., 0:1] + parts["f_q"] * wt[..., 1:2]
        pred = self._cls_up(parts["w"], out)[0]
        loss = _disagreement_loss(pred, pred0, pred1, episode["q_label"])
        return loss, {"pred1": pred1, "pred": pred}

    # ------------------------------------------------------------------ #

    def train_episode_loss(self, trainables, vars_b, episode, rng,
                           frozen_vars=None):
        rng_w, rng_head = jax.random.split(rng)
        parts = self.episode_parts(vars_b, episode, rng_w)
        # use_amp (the reference trainers' torch.cuda.amp.autocast,
        # src/train_kshot.py:146-190): run the HEAD compute in bf16 — cast
        # the features/classifier and the head params at the loss boundary;
        # master weights stay f32 (grads flow back through the casts), and
        # _up casts to f32 so losses/metrics keep full precision. bf16 needs
        # no GradScaler (its exponent range matches f32).
        loss_parts, loss_train, loss_frozen = parts, trainables, frozen_vars
        if self.cfg.get("use_amp", False):
            amp_cast = lambda tree: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                tree,
            )
            loss_parts = amp_cast(parts)
            loss_train = amp_cast(trainables)
            loss_frozen = None if frozen_vars is None else amp_cast(frozen_vars)
        # whole-loss remat: see head_remat_default for the per-head policy
        remat = (lambda f: jax.checkpoint(f)) \
            if head_remat_default(self.cfg, self.head_type) else (lambda f: f)
        if self.head_type == "asy":
            loss, preds = remat(self._loss_asy)(
                loss_train, loss_parts, episode, rng_head)
        elif self.head_type == "fuse":
            loss, preds = remat(self._loss_fuse)(
                {"params": loss_train}, loss_parts, episode, rng_head, loss_frozen)
        else:
            loss, preds = remat(getattr(self, f"_loss_{self.head_type}"))(
                {"params": loss_train}, loss_parts, episode, rng_head
            )
        loss = loss.astype(jnp.float32)
        metrics = {"loss": loss}
        pred0 = self._up(parts["pd_q0"])[0]
        for name, p in (("0", pred0), ("1", preds["pred1"]), ("", preds["pred"])):
            inter, union, _ = intersection_and_union(
                jnp.argmax(p, -1), episode["q_label"], self.num_classes
            )
            metrics[f"inter{name}"] = inter
            metrics[f"union{name}"] = union
        return loss, metrics

    def make_train_step(self, optimizer: optax.GradientTransformation):
        # Episode gradients accumulate SEQUENTIALLY (lax.scan) instead of
        # vmapping value_and_grad over the batch: grad(mean loss) is exactly
        # the mean of per-episode grads, and one episode's forward+backward
        # at a time bounds HBM by the episode, not the batch — the corr
        # heads' (h,w,hs,ws,C) volumes made a vmapped backward exceed chip
        # memory at the 473px protocol. cfg.head_grad_accum False restores
        # the vmapped step (fastest at tiny shapes).
        per_ep_grad = jax.value_and_grad(self.train_episode_loss, has_aux=True)

        def grads_vmapped(trainables, vars_b, batch, rngs, frozen_vars):
            def batched(tr, vb, b, r, fv):
                losses, metrics = jax.vmap(
                    self.train_episode_loss, in_axes=(None, None, 0, 0, None)
                )(tr, vb, b, r, fv)
                return jnp.mean(losses), metrics

            (loss, metrics), grads = jax.value_and_grad(batched, has_aux=True)(
                trainables, vars_b, batch, rngs, frozen_vars)
            return loss, metrics, grads

        def grads_scanned(trainables, vars_b, batch, rngs, frozen_vars):
            zero_g = jax.tree.map(jnp.zeros_like, trainables)

            def body(carry, xs):
                g_acc, loss_acc = carry
                episode, r = xs
                (loss, metrics), g = per_ep_grad(
                    trainables, vars_b, episode, r, frozen_vars)
                return (jax.tree.map(jnp.add, g_acc, g), loss_acc + loss), metrics

            (g_sum, loss_sum), metrics = jax.lax.scan(
                body, (zero_g, jnp.zeros((), jnp.float32)), (batch, rngs))
            e = rngs.shape[0]
            grads = jax.tree.map(lambda g: g / e, g_sum)
            return loss_sum / e, metrics, grads

        grad_fn = grads_scanned if self.cfg.get("head_grad_accum", True) \
            else grads_vmapped

        @functools.partial(jax.jit, static_argnames=())
        def step(trainables, opt_state, vars_b, batch, rng, frozen_vars=None):
            e = batch["q_label"].shape[0]
            rngs = jax.random.split(rng, e)
            loss, metrics, grads = grad_fn(trainables, vars_b, batch, rngs, frozen_vars)
            updates, opt_state = optimizer.update(grads, opt_state, trainables)
            trainables = optax.apply_updates(trainables, updates)
            metrics = dict(metrics)
            metrics["loss_mean"] = loss
            return trainables, opt_state, metrics

        return step

    @functools.cached_property
    def eval_metrics_batch(self):
        """Validation: deterministic head forward, metrics for pred1 and pred."""

        def eval_tail(trainables, parts, episode, rng, frozen_vars):
            if self.head_type == "asy":
                _, preds = self._loss_asy(trainables, parts, episode, rng, det=True)
            elif self.head_type == "fuse":
                _, preds = self._loss_fuse({"params": trainables}, parts, episode,
                                           rng, frozen_vars, det=True)
            else:
                loss_fn = getattr(self, f"_loss_{self.head_type}")
                _, preds = loss_fn({"params": trainables}, parts, episode, rng,
                                   det=True)
            out = {"cls": episode["cls"], "loss": cross_entropy(
                preds["pred"], episode["q_label"])}
            for name, p in (("0", self._up(parts["pd_q0"])[0]),
                            ("1", preds["pred1"]), ("", preds["pred"])):
                inter, union, _ = intersection_and_union(
                    jnp.argmax(p, -1), episode["q_label"], self.num_classes
                )
                out[f"inter{name}"] = inter
                out[f"union{name}"] = union
            return out

        def eval_one(trainables, vars_b, episode, rng, frozen_vars):
            parts = self.episode_parts(vars_b, episode, rng)
            return eval_tail(trainables, parts, episode, rng, frozen_vars)

        # lax.map, not vmap: batching the episode axis over the rank-4
        # consensus route turns its rank-4 transposes into rank-5 ones, for
        # which XLA:TPU picks layouts with catastrophic padding (a 49 MB
        # bf16 volume ballooned to 6.2 GB; the vmapped eval program then
        # demanded 26 GB of HBM). The sequential map keeps each episode's
        # program identical to the train step's per-episode forward, and
        # eval is forward-only so there is no batching win to lose.
        # eval_episode_tile > 1 vmaps the map in chunks of that many
        # episodes (lax.map batch_size) — the dial for sub-473 shapes where
        # the rank-5 layouts stay sane; it must divide the batch.
        tile = int(self.cfg.get("eval_episode_tile", 1) or 1)
        # eval_split_prologue: batch the episode PROLOGUE (backbone features
        # + inner-loop adaptation — plain NHWC convs and a scan, which
        # batch cleanly and carry none of the consensus route's rank-5
        # layout hazard) across all episodes with ONE vmapped call, then
        # lax.map only the head forward. Identical math; the lax.map fence
        # stays exactly where the hazard is.
        split = bool(self.cfg.get("eval_split_prologue", False))

        def fn(trainables, vars_b, batch, rngs, frozen_vars):
            if split:
                parts_all = jax.vmap(
                    self.episode_parts, in_axes=(None, 0, 0)
                )(vars_b, batch, rngs)
                f = lambda per: eval_tail(trainables, per[0], per[1], per[2],
                                          frozen_vars)
                xs = (parts_all, batch, rngs)
            else:
                f = lambda er: eval_one(trainables, vars_b, er[0], er[1],
                                        frozen_vars)
                xs = (batch, rngs)
            if tile > 1 and batch["q_label"].shape[0] % tile == 0:
                return jax.lax.map(f, xs, batch_size=tile)
            return jax.lax.map(f, xs)

        return jax.jit(fn)

    # serving: heads whose deterministic prediction is label-free. asy/att
    # thread the query label into the ignore-mask that shapes the prediction
    # itself (get_ig_mask/outer_forward), so they have no serving form; the
    # match head is servable only with the eval-time `ignore` re-readout off.
    SERVABLE = ("mmn", "match", "chm", "detr", "fuse")

    def serve_episode(self, vars_b, trainables, episode, rng,
                      frozen_vars=None) -> jnp.ndarray:
        """Label-free inference: episode -> (H, W) int32 query mask.

        Runs the head's deterministic eval forward with a placeholder query
        label: for the servable heads the prediction never reads it (the
        loss that does is an unused output, removed by XLA DCE), so the
        exported program is exactly the validation-time blended prediction
        (argmax of preds['pred']). Used by tools/export_serve.
        """
        if self.head_type not in self.SERVABLE:
            raise ValueError(
                f"head '{self.head_type}' has no label-free serving form "
                "(its prediction consumes the query-label ignore mask)")
        if self.head_type == "match" and self.cfg.get("ignore", False):
            raise ValueError(
                "match-head serving requires `ignore False`: the eval-time "
                "ig-mask re-readout consumes the query label")
        episode = dict(episode)
        episode["q_label"] = jnp.zeros(
            episode["q_img"].shape[-3:-1], jnp.int32)
        parts = self.episode_parts(vars_b, episode, rng)
        if self.head_type == "fuse":
            _, preds = self._loss_fuse({"params": trainables}, parts, episode,
                                       rng, frozen_vars, det=True)
        else:
            loss_fn = getattr(self, f"_loss_{self.head_type}")
            _, preds = loss_fn({"params": trainables}, parts, episode, rng,
                               det=True)
        return jnp.argmax(preds["pred"], -1).astype(jnp.int32)


def _disagreement_loss(pred, pred0, pred1, q_label, ignore_index: int = 255):
    """Disagreement-weighted CE (reference: src/train_fuse.py:185-189)."""
    wt = ((jnp.argmax(pred0, -1) != jnp.argmax(pred1, -1))
          & (q_label != ignore_index)).astype(jnp.float32)
    wt = jnp.where(wt == 0.0, 0.001, wt)
    valid = q_label != ignore_index
    tgt = jnp.where(valid, q_label, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
    nll = nll * valid.astype(jnp.float32)
    return jnp.sum(nll * wt) / jnp.sum(wt)
