"""Golden-value parity of core ops against PyTorch (CPU) semantics.

These pin the exact numerics the reference relies on: align_corners bilinear
zoom, adaptive average pooling, weighted CE with ignore_index, dice, and the
histc-style IoU counting.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from few_shot_seg_cwt_tpu.ops import (
    adaptive_avg_pool,
    batch_intersection_and_union,
    class_balance_weights,
    cross_entropy,
    intersection_and_union,
    resize_nearest,
    smoothed_cross_entropy,
    upsample_bilinear_ac,
    weighted_cross_entropy,
    weighted_dice_loss,
)


@pytest.mark.parametrize("in_hw,out_hw", [((60, 60), (473, 473)), ((7, 9), (30, 20)), ((30, 30), (60, 60)), ((5, 5), (5, 5))])
def test_bilinear_align_corners_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(upsample_bilinear_ac(jnp.asarray(x), out_hw))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=out_hw, mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,bins", [((60, 60), 1), ((60, 60), 2), ((60, 60), 3), ((60, 60), 6), ((53, 53), 6), ((17, 13), 3)])
def test_adaptive_avg_pool_matches_torch(rng, in_hw, bins):
    x = rng.standard_normal((2, *in_hw, 4)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), (bins, bins)))
    ref = F.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), bins
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_nearest_resize_matches_torch(rng):
    x = rng.standard_normal((1, 473, 473, 1)).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), (60, 60)))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(60, 60), mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, ref)


def test_weighted_ce_matches_torch(rng):
    logits = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 16, 16)).astype(np.int64)
    target[0, :3, :3] = 255
    w = np.array([1.0, 7.3], dtype=np.float32)
    got = float(weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(w)))
    ref = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w), ignore_index=255)(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(target)
    ).item()
    assert abs(got - ref) < 1e-5


def test_unweighted_ce_matches_torch(rng):
    logits = rng.standard_normal((1, 8, 8, 5)).astype(np.float32)
    target = rng.integers(0, 5, size=(1, 8, 8)).astype(np.int64)
    target[0, 0, :] = 255
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    ref = torch.nn.CrossEntropyLoss(ignore_index=255)(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(target)
    ).item()
    assert abs(got - ref) < 1e-5


def test_class_balance_weights(rng):
    label = np.zeros((1, 10, 10), dtype=np.int32)
    label[0, :2, :] = 1      # 20 fg
    label[0, 9, :5] = 255    # 5 ignored
    w = np.asarray(class_balance_weights(jnp.asarray(label)))
    # bg = 100 - 20 - 5 = 75, fg = 20
    np.testing.assert_allclose(w, [1.0, 75.0 / 20.0], rtol=1e-6)


def test_dice_matches_reference_formula(rng):
    logits = rng.standard_normal((2, 12, 12, 2)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 12, 12)).astype(np.int64)
    target[1, 4:6, :] = 255
    got = float(weighted_dice_loss(jnp.asarray(logits), jnp.asarray(target)))

    # independent torch re-statement of the formula
    t = torch.from_numpy(target)
    fg, bg = (t == 1).float(), (t == 0).float()
    tgt = torch.stack([bg, fg], dim=1)  # (B,2,H,W)
    pred = torch.sigmoid(torch.from_numpy(logits).permute(0, 3, 1, 2))
    n = tgt.shape[0]
    pred = pred.reshape(-1, 12 * 12)
    tgt = tgt.reshape(-1, 12 * 12)
    part = (pred**2).sum(-1) + (tgt**2).sum(-1)
    ref = (1 - 2 * (pred * tgt).sum(-1) / part.clamp(min=1e-8)).sum() / n
    assert abs(got - ref.item()) < 1e-5


def test_smoothed_ce_value(rng):
    logits = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    target = rng.integers(0, 3, size=(1, 4, 4)).astype(np.int64)
    got = float(smoothed_cross_entropy(jnp.asarray(logits), jnp.asarray(target), 3, smoothing=0.1))
    lt = torch.from_numpy(logits)
    onehot = torch.nn.functional.one_hot(torch.from_numpy(target), 3).float()
    # reference smoothing (src/pretrain.py:198): eps/(C-1) on the off-classes
    smoothed = onehot * 0.9 + (1 - onehot) * (0.1 / 2)
    logp = torch.log_softmax(lt, dim=-1)
    ref = (-(smoothed * logp).sum(-1)).mean().item()
    assert abs(got - ref) < 1e-5


def test_iou_matches_torch_histc(rng):
    preds = rng.integers(0, 2, size=(473, 473)).astype(np.int64)
    target = rng.integers(0, 2, size=(473, 473)).astype(np.int64)
    target[:15, :] = 255
    inter, union, tgt = intersection_and_union(jnp.asarray(preds), jnp.asarray(target), 2)

    p = torch.from_numpy(preds).clone().view(-1)
    t = torch.from_numpy(target).view(-1)
    p[t == 255] = 255
    it = p[p == t]
    ai = torch.histc(it.float(), bins=2, min=0, max=1)
    ao = torch.histc(p.float(), bins=2, min=0, max=1)
    at = torch.histc(t.float(), bins=2, min=0, max=1)
    np.testing.assert_allclose(np.asarray(inter), ai.numpy())
    np.testing.assert_allclose(np.asarray(union), (ao + at - ai).numpy())
    np.testing.assert_allclose(np.asarray(tgt), at.numpy())


def test_batch_iou_upsamples_before_argmax(rng):
    logits = rng.standard_normal((2, 1, 8, 8, 2)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 1, 31, 31)).astype(np.int64)
    inter, union, _ = batch_intersection_and_union(jnp.asarray(logits), jnp.asarray(target), 2)

    lt = torch.from_numpy(logits.reshape(2, 8, 8, 2)).permute(0, 3, 1, 2)
    up = F.interpolate(lt, size=(31, 31), mode="bilinear", align_corners=True)
    preds = up.argmax(1).numpy()
    for task in range(2):
        i2, u2, _ = intersection_and_union(jnp.asarray(preds[task]), jnp.asarray(target[task, 0]), 2)
        np.testing.assert_allclose(np.asarray(inter[task, 0]), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(union[task, 0]), np.asarray(u2))
