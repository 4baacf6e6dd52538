"""Dilated deep-stem ResNet backbones (flax), NHWC, TPU-native.

Re-design of the reference backbone (reference: src/model/resnet.py:57-226 and
the dilation surgery in src/model/pspnet.py:103-112): ResNet-50/101 with

* the PSPNet "deep base" stem: three 3x3 convs 3->64->64->128 + maxpool;
* layer3 with conv2 dilation 2 / stride 1, layer4 with dilation 4 / stride 1
  (output stride 8 — 60x60 feature maps at 473x473 input);
* optional pre-ReLU output of the last layer4 block (``no_relu``,
  reference src/model/resnet.py:92-96) used by the ``rmid='nr'`` variants.

Instead of post-hoc "surgery" on torch modules, dilation/stride are
constructor arguments. Per-block intermediate features are returned in a dict
so downstream matching heads (MMN, reference src/model/mmn.py:42-59) can pick
any block; XLA dead-code-eliminates whatever the caller does not use.

Layout is NHWC with explicit torch-style padding so outputs match the
reference for any input parity. BatchNorm carries running statistics in the
``batch_stats`` collection; pass ``train=True`` to use batch statistics
(cross-replica sync is the caller's job via ``axis_name``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
         name: Optional[str] = None) -> nn.Conv:
    """3x3/1x1/7x7 conv with explicit torch-equivalent padding, no bias."""
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        kernel_init=_conv_init,
        name=name,
    )


def batch_norm(train: bool, name: Optional[str] = None,
               axis_name: Optional[str] = None) -> nn.BatchNorm:
    """BatchNorm2d parity: eps 1e-5, torch momentum 0.1 (flax momentum 0.9).

    use_fast_variance=False: the two-pass variance (mean((x-mean)^2)) is what
    torch BatchNorm computes; flax's one-pass default (E[x^2]-E[x]^2)
    catastrophically cancels for low-batch-variance activations (e.g. the
    PPM's 1x1-pooled bins), which made mesh-sharded live-BN pretraining
    diverge from the unsharded step at 1e-4 when XLA re-associated the two
    big sums (tests/test_parallel.py::test_pretrain_bn_syncbn_equivalence).
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        axis_name=axis_name if train else None,
        use_fast_variance=False,
        name=name,
    )


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(kernel=3, stride=2, padding=1) with -inf padding."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype in (jnp.float32, jnp.float64) else jnp.finfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride/dilation) -> 1x1(x4) with projection shortcut."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    return_pre_relu: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        residual = x
        out = conv(self.planes, 1, name="conv1")(x)
        out = batch_norm(train, "bn1", self.axis_name)(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, self.stride, self.dilation, name="conv2")(out)
        out = batch_norm(train, "bn2", self.axis_name)(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, name="conv3")(out)
        out = batch_norm(train, "bn3", self.axis_name)(out)
        if self.has_downsample:
            residual = conv(self.planes * 4, 1, self.stride, name="downsample_conv")(x)
            residual = batch_norm(train, "downsample_bn", self.axis_name)(residual)
        out = out + residual
        if self.return_pre_relu:
            return nn.relu(out), out
        return nn.relu(out)


# block counts per stage (reference: src/model/resnet.py:198,210)
RESNET_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
RESNET_CHANNELS = (256, 512, 1024, 2048)


class DilatedResNet(nn.Module):
    """Deep-stem dilated ResNet trunk returning per-block feature dict.

    ``__call__`` returns ``(x4, feats)`` where ``feats[stage] = [block outputs]``
    for stages 1..4, plus ``feats['nr']`` (pre-ReLU last block) if
    ``no_relu``. Callers slice ``feats`` statically; unused entries are DCE'd.
    """

    depth: int = 50
    no_relu: bool = False
    axis_name: Optional[str] = None
    # mixed per-stage dtype policy ((stage, dtype-name), ...); None = no casts
    # (uniform policies are handled by whole-tree casts at the engine level)
    stage_dtypes: Optional[Tuple[Tuple[str, str], ...]] = None

    def _stage_cast(self, x: jnp.ndarray, stage: str) -> jnp.ndarray:
        if self.stage_dtypes is None:
            return x
        return x.astype(jnp.dtype(dict(self.stage_dtypes)[stage]))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # deep stem: 3x3 s2 -> 3x3 -> 3x3, 3->64->64->128
        x = self._stage_cast(x, "stem")
        x = nn.relu(batch_norm(train, "bn1", self.axis_name)(conv(64, 3, 2, name="conv1")(x)))
        x = nn.relu(batch_norm(train, "bn2", self.axis_name)(conv(64, 3, name="conv2")(x)))
        x = nn.relu(batch_norm(train, "bn3", self.axis_name)(conv(128, 3, name="conv3")(x)))
        x = max_pool_3x3_s2(x)

        blocks = RESNET_DEPTHS[self.depth]
        # (planes, first-block stride, dilation) per stage; layers 3/4 dilated
        stage_spec = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        feats: Dict[Any, List[jnp.ndarray]] = {}
        for stage_idx, ((planes, stride, dilation), n_blocks) in enumerate(
            zip(stage_spec, blocks), start=1
        ):
            x = self._stage_cast(x, f"layer{stage_idx}")
            outs: List[jnp.ndarray] = []
            for b in range(n_blocks):
                is_last = self.no_relu and stage_idx == 4 and b == n_blocks - 1
                block = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    dilation=dilation,
                    has_downsample=(b == 0),
                    return_pre_relu=is_last,
                    axis_name=self.axis_name,
                    name=f"layer{stage_idx}_{b}",
                )
                if is_last:
                    x, x_nr = block(x, train)
                    feats["nr"] = [x_nr]
                else:
                    x = block(x, train)
                outs.append(x)
            feats[stage_idx] = outs
        return x, feats
