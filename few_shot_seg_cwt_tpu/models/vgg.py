"""VGG-16 (batch-norm) backbone (flax, NHWC).

Alternative backbone (``arch: vgg``). The reference slices torchvision's
``vgg16_bn().features`` into five stages (reference: src/model/pspnet.py:41-67):
stage 0 = 2x conv64 + pool, 1 = 2x conv128 + pool, 2 = 3x conv256 + pool,
3 = 3x conv512 + pool, 4 = 3x conv512 (no trailing pool). The dilation
surgery does not touch VGG (its modules are anonymous), so the output stride
is 16; pools are ceil_mode (30x30 feature maps at 473 input).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import batch_norm, conv

# (number of convs, channels, trailing maxpool) per stage
_VGG16_STAGES = [
    (2, 64, True),
    (2, 128, True),
    (3, 256, True),
    (3, 512, True),
    (3, 512, False),
]


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(kernel=2, stride=2, ceil_mode=True): odd edges padded (-inf)."""
    pad_h = x.shape[-3] % 2
    pad_w = x.shape[-2] % 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


class VGG16BN(nn.Module):
    """Five-stage VGG-16bn trunk returning per-stage feature dict."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats: Dict[int, List[jnp.ndarray]] = {}
        for stage_idx, (n_convs, ch, pool) in enumerate(_VGG16_STAGES):
            for b in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    name=f"stage{stage_idx}_conv{b}",
                )(x)
                x = batch_norm(train, f"stage{stage_idx}_bn{b}", self.axis_name)(x)
                x = nn.relu(x)
            if pool:
                x = max_pool_2x2(x)
            if stage_idx >= 1:
                feats[stage_idx] = [x]
        return x, feats
