"""PSPNet feature extractor + episodic classifiers (flax, NHWC).

Re-design of the reference PSPNet (reference: src/model/pspnet.py:19-334):

* Pyramid Pooling Module: adaptive-avg-pool to bins [1,2,3,6] -> 1x1
  conv+BN+ReLU -> bilinear(align_corners) upsample -> concat (src:19-38).
  Pooling and upsampling are separable matmuls (see ops.resize), so the whole
  PPM lowers to MXU-friendly contractions.
* bottleneck: 3x3 conv 4096->512 + BN + ReLU + channel dropout (src:124-129).
* classifiers: plain dot-product 1x1 conv (optionally weight-normalized) and
  the cosine classifier family ``CosCls`` (src:290-323), parameterized by the
  same 4-char ``cls_type`` string.
* ``gamma`` blending scalar for the transductive head (src:141).

``extract_features`` returns the 60x60x512 episode feature map plus the
per-block trunk features dict for the matching heads.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import adaptive_avg_pool, upsample_bilinear_ac
from .resnet import DilatedResNet, batch_norm, conv
from .vgg import VGG16BN

# torch nn.Conv2d default (kaiming_uniform a=sqrt(5)): U(+-1/sqrt(fan_in))
conv1x1_default_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# backbone stages addressable by the per-stage dtype policy
BACKBONE_STAGES = ("stem", "layer1", "layer2", "layer3", "layer4",
                   "ppm", "bottleneck")


def stage_dtype_policy(cfg) -> Dict[str, Any]:
    """Per-stage backbone compute dtype {stage: jnp dtype}.

    ``compute_dtype bfloat16`` (or the reference's ``use_amp``) runs EVERY
    stage in bf16 — the whole-backbone cast. With fp32 compute, the
    ``bf16_stages`` knob ("all" or a comma list of BACKBONE_STAGES, e.g.
    "stem,layer1,layer2") promotes only the listed stages to bf16 so the
    accuracy cost can be localized per stage (the r2 whole-backbone A/B
    could not say WHERE precision matters).
    """
    full_bf16 = (
        str(cfg.get("compute_dtype", "float32")) == "bfloat16"
        or cfg.get("use_amp", False)
    )
    if full_bf16:
        return {s: jnp.bfloat16 for s in BACKBONE_STAGES}
    sel = cfg.get("bf16_stages", None)
    if not sel:
        return {s: jnp.float32 for s in BACKBONE_STAGES}
    chosen = (set(BACKBONE_STAGES) if str(sel) == "all"
              else {s.strip() for s in str(sel).split(",") if s.strip()})
    unknown = chosen - set(BACKBONE_STAGES)
    assert not unknown, f"bf16_stages: unknown stages {sorted(unknown)}"
    assert cfg.get("arch", "resnet") == "resnet", (
        "per-stage bf16 policy is defined for the resnet trunk only"
    )
    return {s: (jnp.bfloat16 if s in chosen else jnp.float32)
            for s in BACKBONE_STAGES}


def _policy_tuple(policy: Dict[str, Any]):
    """Hashable form for module attrs; None when the policy is uniform f32."""
    if all(dt == jnp.float32 for dt in policy.values()):
        return None
    return tuple((s, jnp.dtype(policy[s]).name) for s in BACKBONE_STAGES)


def policy_is_noop(policy: Dict[str, Any]) -> bool:
    return set(policy.values()) == {jnp.float32}


def cast_backbone_io(policy: Dict[str, Any], variables, imgs):
    """Apply a stage dtype policy to backbone variables + input images.

    The single implementation every engine shares (EpisodicEngine, HeadEngine,
    CCAEngine, bench probes): uniform f32 is a no-op; uniform bf16 casts the
    whole tree; a MIXED policy casts params/stats per stage path, matching the
    stage-boundary activation casts the model installs (build_pspnet).
    Consumers must cast the OUTPUT features back to f32 themselves.
    """
    dts = set(policy.values())
    if dts == {jnp.float32}:
        return variables, imgs
    if dts == {jnp.bfloat16}:
        cast = lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating) else x
        return jax.tree.map(cast, variables), imgs.astype(jnp.bfloat16)

    def path_stage(path):
        keys = [getattr(p, "key", None) for p in path]
        if "trunk" in keys:
            nxt = keys[keys.index("trunk") + 1]
            return ("layer" + nxt[5] if str(nxt).startswith("layer")
                    else "stem")
        if "ppm" in keys:
            return "ppm"
        if any(str(k).startswith("bottleneck") for k in keys):
            return "bottleneck"
        return None  # classifier/gamma: untouched (episodic math is f32)

    def cast(path, x):
        st = path_stage(path)
        x = jnp.asarray(x)
        if st is None or not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        return x.astype(policy[st])

    return (jax.tree_util.tree_map_with_path(cast, variables),
            imgs.astype(policy["stem"]))


def init_classifier_weights(rng: jax.Array, num_classes: int, in_dim: int,
                            dtype=jnp.float32) -> jnp.ndarray:
    """Fresh episodic 1x1-classifier weights, torch Conv2d default init.

    Matches ``nn.Conv2d(512, 2, 1, bias=False)`` re-created per episode
    (reference: src/train.py:206, src/test.py:164).
    """
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    return jax.random.uniform(
        rng, (num_classes, in_dim), dtype, minval=-bound, maxval=bound
    )


def apply_classifier(weights: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv as einsum: (K, C) weights x (..., H, W, C) -> (..., H, W, K)."""
    return jnp.einsum(
        "...hwc,kc->...hwk", features, weights, preferred_element_type=features.dtype
    )


class PPM(nn.Module):
    """Pyramid Pooling Module."""

    reduction_dim: int
    bins: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[-3], x.shape[-2]
        outs = [x]
        for i, b in enumerate(self.bins):
            p = adaptive_avg_pool(x, (b, b))
            p = conv(self.reduction_dim, 1, name=f"bin{i}_conv")(p)
            p = batch_norm(train, f"bin{i}_bn", self.axis_name)(p)
            p = nn.relu(p)
            outs.append(upsample_bilinear_ac(p, (h, w)))
        return jnp.concatenate(outs, axis=-1)


def parse_cls_type(cls_type: str) -> Tuple[bool, bool, bool, bool]:
    """4-char flags: weight-norm-reparam, fwd weight-normalize, bias, learnable temp."""
    lut = {"r": True, "n": True, "b": True, "t": True, "0": False, "o": False}
    # published configs ship 3-char 'ooo' (pascal_{asy,fuse,match}.yaml) which
    # IndexErrors the reference's own parser (src/model/pspnet.py:322,
    # cls_type[3]); pad with 'o' (= all-off) instead of reproducing the crash
    ct = (cls_type + "oooo")[:4]
    return tuple(lut[c] for c in ct)  # type: ignore[return-value]


class CosCls(nn.Module):
    """Cosine classifier (reference: src/model/pspnet.py:290-312)."""

    in_dim: int = 512
    n_classes: int = 2
    cls_type: str = "oooo"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        wn_reparam, weight_norm, use_bias, learn_temp = parse_cls_type(self.cls_type)
        w = self.param("weight", conv1x1_default_init, (self.in_dim, self.n_classes))
        if wn_reparam:
            # torch WeightNorm inits g = ||v|| so the initial function is
            # unchanged by the reparameterization
            g = self.param("weight_g", lambda _rng, _shape: jnp.linalg.norm(w, axis=0),
                           (self.n_classes,))
            w = w * g / jnp.linalg.norm(w, axis=0, keepdims=True)
        if weight_norm:
            w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-5)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-5)
        out = jnp.einsum("...c,ck->...k", x, w)
        if use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.n_classes,))
        scale = (
            self.param("scale_factor", nn.initializers.constant(2.0), ())
            if learn_temp else 2.0
        )
        return out * scale


def effective_classifier_weight(params) -> jnp.ndarray:
    """The classifier's EFFECTIVE (K, C) weight from a variables['params'] tree.

    Under weight-norm reparameterization (cls_type 'r***') the stored
    'weight' is the direction v; the weight the module applies is
    g * v / ||v|| — the same value torch's WeightNorm recomputes for
    ``model.classifier.weight``. Callers that inject or compare classifier
    rows (the CCA trainers' base-class inheritance and pseudo-labeling)
    must use this, never the raw 'weight' param.
    """
    cls = params["classifier"]
    w = jnp.asarray(cls["weight"])                     # (C, K)
    if "weight_g" in cls:
        g = jnp.asarray(cls["weight_g"])               # (K,)
        w = w * g / jnp.linalg.norm(w, axis=0, keepdims=True)
    return w.T                                         # (K, C)


class DotCls(nn.Module):
    """Plain 1x1-conv classifier, optionally weight-norm reparameterized."""

    in_dim: int = 512
    n_classes: int = 2
    weight_norm_reparam: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", conv1x1_default_init, (self.in_dim, self.n_classes))
        if self.weight_norm_reparam:
            g = self.param("weight_g", lambda _rng, _shape: jnp.linalg.norm(w, axis=0),
                           (self.n_classes,))
            w = w * g / jnp.linalg.norm(w, axis=0, keepdims=True)
        return jnp.einsum("...c,ck->...k", x, w)


class PSPNet(nn.Module):
    """Dilated backbone + PPM + bottleneck + classifier.

    Config mirrors the reference flat namespace (arch/layers/bins/dropout/
    bottleneck_dim/num_classes_tr/dist/cls_type/rmid/inherit_base).
    """

    arch: str = "resnet"
    layers: int = 50
    bins: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1
    bottleneck_dim: int = 512
    num_classes_tr: int = 2
    dist: str = "dot"
    cls_type: str = "oooo"
    rmid: Optional[str] = None
    inherit_base: bool = False
    zoom_factor: int = 8
    axis_name: Optional[str] = None
    # per-stage compute dtypes as a hashable tuple ((stage, dtype-name), ...)
    # from stage_dtype_policy; None = no activation casts (uniform fp32, or
    # the engine-level whole-tree bf16 cast which needs no stage boundaries)
    stage_dtypes: Optional[Tuple[Tuple[str, str], ...]] = None

    def _stage_cast(self, x: jnp.ndarray, stage: str) -> jnp.ndarray:
        if self.stage_dtypes is None:
            return x
        return x.astype(jnp.dtype(dict(self.stage_dtypes)[stage]))

    def setup(self):
        if self.arch == "resnet":
            self.trunk = DilatedResNet(
                depth=self.layers, no_relu=(self.rmid == "nr"), axis_name=self.axis_name,
                stage_dtypes=self.stage_dtypes,
            )
            fea_dim = 2048
        elif self.arch == "vgg":
            self.trunk = VGG16BN(axis_name=self.axis_name)
            fea_dim = 512
        else:
            raise ValueError(f"unknown arch {self.arch}")
        self.ppm = PPM(
            reduction_dim=fea_dim // len(self.bins), bins=tuple(self.bins),
            axis_name=self.axis_name,
        )
        self.bottleneck_conv = conv(self.bottleneck_dim, 3, name="bottleneck_conv")
        self.bottleneck_bn = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, axis_name=self.axis_name,
            use_fast_variance=False,  # torch's two-pass var; see resnet.batch_norm
            name="bottleneck_bn"
        )
        self.drop = nn.Dropout(rate=self.dropout, broadcast_dims=(-3, -2))
        if self.dist == "dot":
            self.classifier = DotCls(
                in_dim=self.bottleneck_dim,
                n_classes=self.num_classes_tr,
                weight_norm_reparam=(self.cls_type[0] == "r"),
            )
        elif self.dist in ("cos", "cosN"):
            self.classifier = CosCls(
                in_dim=self.bottleneck_dim,
                n_classes=self.num_classes_tr,
                cls_type=self.cls_type,
            )
        else:
            raise ValueError(f"unknown dist {self.dist}")
        if self.inherit_base:
            self.val_classifier = DotCls(
                in_dim=self.bottleneck_dim, n_classes=self.num_classes_tr + 1
            )
        self.gamma = self.param("gamma", nn.initializers.constant(0.2), ())

    def extract_features(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[Any, Any]]:
        """Backbone + PPM + bottleneck. x: (B, H, W, 3) -> (B, h, w, 512), feats."""
        x4, feats = self.trunk(x, train=train)
        out = self.ppm(self._stage_cast(x4, "ppm"), train=train)
        out = self.bottleneck_conv(self._stage_cast(out, "bottleneck"))
        out = self.bottleneck_bn(out, use_running_average=not train)
        out = nn.relu(out)
        out = self.drop(out, deterministic=not train)
        return out, feats

    def classify(self, features: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
        """Classifier logits zoomed to ``shape`` (align_corners bilinear)."""
        x = self.classifier(features)
        if self.zoom_factor != 1:
            x = upsample_bilinear_ac(x, shape)
        return x

    def classify_val(self, features: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
        x = self.val_classifier(features)
        if self.zoom_factor != 1:
            x = upsample_bilinear_ac(x, shape)
        return x

    def __call__(self, x: jnp.ndarray, train: bool = False):
        h_in, w_in = x.shape[-3], x.shape[-2]
        out_h = (h_in - 1) // 8 * self.zoom_factor + 1
        out_w = (w_in - 1) // 8 * self.zoom_factor + 1
        feat, feats = self.extract_features(x, train=train)
        logits = self.classify(feat, (out_h, out_w))
        if self.rmid:
            return logits, feats
        return logits


def build_pspnet(cfg, axis_name: Optional[str] = None) -> PSPNet:
    """Construct a PSPNet from a flat config (reference get_model, pspnet.py:15).

    ``axis_name`` wires BN cross-replica stat reduction for shard_map/pmap
    per-device programs ONLY. The jit trainers never pass it — under jit's
    global-array semantics batch-stat BN already reduces over the global
    sharded batch (SyncBN-equivalent; proven by
    tests/test_parallel.py::test_pretrain_bn_syncbn_equivalence).
    """
    # stage-boundary activation casts only for a MIXED dtype policy; the
    # uniform-bf16 path keeps the engine-level whole-tree cast (no boundaries)
    policy = stage_dtype_policy(cfg)
    dts = set(policy.values())
    stage_dtypes = _policy_tuple(policy) if len(dts) > 1 else None
    return PSPNet(
        arch=cfg.arch,
        layers=cfg.layers,
        bins=tuple(cfg.bins),
        dropout=cfg.dropout,
        bottleneck_dim=cfg.bottleneck_dim,
        num_classes_tr=cfg.num_classes_tr,
        dist=cfg.get("dist", "dot"),
        cls_type=cfg.cls_type,
        rmid=cfg.get("rmid", None),
        inherit_base=cfg.get("inherit_base", False),
        axis_name=axis_name,
        stage_dtypes=stage_dtypes,
    )
