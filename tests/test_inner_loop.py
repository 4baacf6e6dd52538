"""Inner-loop parity: the fused lax.scan adaptation vs a torch re-statement
of the reference's per-episode classifier training (src/train.py:206-231)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from few_shot_seg_cwt_tpu.episodic import adapt_classifier
from few_shot_seg_cwt_tpu.models import init_classifier_weights


def torch_reference_inner_loop(f_s, s_label, w0, steps, lr):
    """Independent torch implementation of the reference inner loop."""
    shot, h, w, c = f_s.shape
    big = s_label.shape[-1]
    cls = nn.Conv2d(c, 2, kernel_size=1, bias=False)
    with torch.no_grad():
        cls.weight.copy_(torch.from_numpy(w0).reshape(2, c, 1, 1))
    opt = torch.optim.SGD(cls.parameters(), lr=lr)
    lbl = torch.from_numpy(s_label).long()
    n_bg = float((lbl == 0).sum())
    n_fg = float((lbl == 1).sum())
    crit = nn.CrossEntropyLoss(weight=torch.tensor([1.0, n_bg / n_fg]), ignore_index=255)
    feats = torch.from_numpy(f_s).permute(0, 3, 1, 2)
    for _ in range(steps):
        out = cls(feats)
        out = F.interpolate(out, size=(big, big), mode="bilinear", align_corners=True)
        loss = crit(out, lbl)
        opt.zero_grad()
        loss.backward()
        opt.step()
    return cls.weight.detach().numpy()[:, :, 0, 0]


def _make_episode(rng, shot=2, h=6, big=25, c=16):
    f_s = rng.standard_normal((shot, h, h, c)).astype(np.float32)
    s_label = rng.integers(0, 2, size=(shot, big, big)).astype(np.int32)
    s_label[0, :3, :] = 255
    return f_s, s_label


def test_adapted_weights_match_torch(rng):
    f_s, s_label = _make_episode(rng)
    w0 = np.asarray(init_classifier_weights(jax.random.PRNGKey(0), 2, 16))

    got = np.asarray(
        adapt_classifier(jnp.asarray(f_s), jnp.asarray(s_label), jnp.asarray(w0),
                         num_steps=25, lr=0.1)
    )
    ref = torch_reference_inner_loop(f_s, s_label, w0, steps=25, lr=0.1)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_adaptation_reduces_support_loss(rng):
    from few_shot_seg_cwt_tpu.episodic.inner_loop import support_loss
    from few_shot_seg_cwt_tpu.ops.losses import class_balance_weights

    f_s, _ = _make_episode(rng)
    # learnable labels: thresholded channel-0 activation, upsampled to 25px
    up = F.interpolate(torch.from_numpy(f_s[..., :1]).permute(0, 3, 1, 2),
                       size=(25, 25), mode="bilinear", align_corners=True)
    s_label = (up[:, 0] > 0).numpy().astype(np.int32)
    w0 = init_classifier_weights(jax.random.PRNGKey(1), 2, 16)
    cw = class_balance_weights(jnp.asarray(s_label))
    before = float(support_loss(w0, jnp.asarray(f_s), jnp.asarray(s_label), cw))
    w = adapt_classifier(jnp.asarray(f_s), jnp.asarray(s_label), w0, num_steps=50, lr=0.1)
    after = float(support_loss(w, jnp.asarray(f_s), jnp.asarray(s_label), cw))
    assert after < before * 0.9


def test_padded_shots_are_no_ops(rng):
    """All-255-labeled padding shots must not change the adapted weights."""
    f_s, s_label = _make_episode(rng, shot=1)
    w0 = init_classifier_weights(jax.random.PRNGKey(2), 2, 16)

    w_plain = adapt_classifier(jnp.asarray(f_s), jnp.asarray(s_label), w0,
                               num_steps=10, lr=0.1)

    pad_f = np.concatenate([f_s, np.zeros_like(f_s)], axis=0)
    pad_l = np.concatenate([s_label, np.full_like(s_label, 255)], axis=0)
    w_padded = adapt_classifier(jnp.asarray(pad_f), jnp.asarray(pad_l), w0,
                                num_steps=10, lr=0.1)
    np.testing.assert_allclose(np.asarray(w_plain), np.asarray(w_padded), rtol=1e-6)


def test_one_shot_duplication_equivalence(rng):
    """The reference duplicates a 1-shot support to batch 2 (src/train.py:199-201);
    with deterministic features this is a mathematical no-op — pin that."""
    f_s, s_label = _make_episode(rng, shot=1)
    w0 = init_classifier_weights(jax.random.PRNGKey(3), 2, 16)
    w1 = adapt_classifier(jnp.asarray(f_s), jnp.asarray(s_label), w0, num_steps=10, lr=0.1)
    f2 = np.concatenate([f_s, f_s], axis=0)
    l2 = np.concatenate([s_label, s_label], axis=0)
    w2 = adapt_classifier(jnp.asarray(f2), jnp.asarray(l2), w0, num_steps=10, lr=0.1)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-5, atol=1e-6)


def test_fast_binary_path_matches_generic(rng):
    """The closed-form K=2 inner loop must equal the autodiff scan exactly."""
    f_s, s_label = _make_episode(rng)
    w0 = init_classifier_weights(jax.random.PRNGKey(5), 2, 16)
    w_fast = adapt_classifier(jnp.asarray(f_s), jnp.asarray(s_label), w0,
                              num_steps=40, lr=0.1, fast_binary=True)
    w_generic = adapt_classifier(jnp.asarray(f_s), jnp.asarray(s_label), w0,
                                 num_steps=40, lr=0.1, fast_binary=False)
    np.testing.assert_allclose(np.asarray(w_fast), np.asarray(w_generic),
                               rtol=1e-4, atol=1e-6)


def test_pallas_kernel_matches_scan_interpret(rng):
    """The VMEM-resident Pallas inner loop (interpret mode) equals the scan."""
    from few_shot_seg_cwt_tpu.ops.pallas_inner_loop import adapt_binary_pallas
    from few_shot_seg_cwt_tpu.ops.losses import class_balance_weights

    f_s, s_label = _make_episode(rng, shot=2, h=6, big=25, c=16)
    w0 = np.asarray(init_classifier_weights(jax.random.PRNGKey(8), 2, 16))
    cw = class_balance_weights(jnp.asarray(s_label))

    ref = adapt_classifier(jnp.asarray(f_s), jnp.asarray(s_label),
                           jnp.asarray(w0), num_steps=30, lr=0.1)

    valid = (s_label != 255)
    y = (s_label == 1).astype(np.float32)
    cw_np = np.asarray(cw)
    pw = np.where(s_label == 1, cw_np[1], cw_np[0]) * valid
    pw = (pw / pw.sum()).astype(np.float32)
    u0 = (w0[1] - w0[0]).astype(np.float32)
    acc = adapt_binary_pallas(
        jnp.asarray(f_s), jnp.asarray(pw), jnp.asarray(pw * y),
        jnp.asarray(u0), num_steps=30, lr=0.1, interpret=True,
    )
    got = np.stack([w0[0] + 0.1 * np.asarray(acc), w0[1] - 0.1 * np.asarray(acc)])
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-6)


def test_binary_ce_from_diff_matches_weighted_ce(rng):
    """The single-plane (diff) CE equals the two-logit weighted CE — value
    and gradient (the 473px eval/train tail runs on one plane, engine.py)."""
    import jax
    import jax.numpy as jnp

    from few_shot_seg_cwt_tpu.ops.losses import (
        binary_weighted_ce_from_diff, weighted_cross_entropy)

    logits = jnp.asarray(rng.standard_normal((37, 41, 2)).astype(np.float32)) * 3
    target = jnp.asarray(rng.choice([0, 1, 255], size=(37, 41),
                                    p=[0.45, 0.45, 0.1]).astype(np.int32))
    cw = jnp.asarray([1.0, 2.7], jnp.float32)

    ref = weighted_cross_entropy(logits, target, cw)
    got = binary_weighted_ce_from_diff(logits[..., 1] - logits[..., 0],
                                       target, cw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)

    # gradients w.r.t. the logits agree through the diff
    g_ref = jax.grad(lambda l: weighted_cross_entropy(l, target, cw))(logits)
    g_diff = jax.grad(
        lambda l: binary_weighted_ce_from_diff(l[..., 1] - l[..., 0], target, cw)
    )(logits)
    np.testing.assert_allclose(np.asarray(g_diff), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_upsampled_diff_tail_matches_generic(rng):
    """engine._upsampled_metrics K=2 plane path == the generic K-channel path
    (upsample-then-argmax, tie -> class 0, CE over valid)."""
    import jax.numpy as jnp

    from few_shot_seg_cwt_tpu.config import default_cfg
    from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
    from few_shot_seg_cwt_tpu.ops.losses import weighted_cross_entropy
    from few_shot_seg_cwt_tpu.ops.metrics import intersection_and_union
    from few_shot_seg_cwt_tpu.ops.resize import upsample_bilinear_ac

    cfg = default_cfg()
    cfg.image_size = 33
    eng = EpisodicEngine(cfg)
    pred = jnp.asarray(rng.standard_normal((5, 5, 2)).astype(np.float32))
    q_label = jnp.asarray(rng.choice([0, 1, 255], size=(33, 33),
                                     p=[0.4, 0.4, 0.2]).astype(np.int32))

    inter, union, loss = jax.jit(eng._upsampled_metrics)(pred, q_label)

    logits = upsample_bilinear_ac(pred[None].astype(jnp.float32), (33, 33))[0]
    ref_i, ref_u, _ = intersection_and_union(jnp.argmax(logits, -1), q_label, 2)
    ref_loss = weighted_cross_entropy(logits, q_label, jnp.ones(2, jnp.float32))
    np.testing.assert_array_equal(np.asarray(inter), np.asarray(ref_i))
    np.testing.assert_array_equal(np.asarray(union), np.asarray(ref_u))
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref_loss), rtol=1e-6)


def test_tiled_pallas_kernel_matches_per_episode(rng):
    """The episode-tiled kernel (interpret mode) equals the per-episode
    kernel / scan for every episode in the tile."""
    import jax.numpy as jnp

    from few_shot_seg_cwt_tpu.ops.losses import class_balance_weights
    from few_shot_seg_cwt_tpu.ops.pallas_inner_loop import (
        adapt_binary_pallas, adapt_binary_pallas_tiled)

    eps = []
    for i in range(4):
        f_s, s_label = _make_episode(np.random.default_rng(50 + i),
                                     shot=1, h=6, big=25, c=16)
        valid = (s_label != 255)
        y = (s_label == 1).astype(np.float32)
        cw = np.asarray(class_balance_weights(jnp.asarray(s_label)))
        pw = np.where(s_label == 1, cw[1], cw[0]) * valid
        pw = (pw / pw.sum()).astype(np.float32)
        u0 = np.asarray(rng.standard_normal(16).astype(np.float32))
        eps.append((f_s.astype(np.float32), pw, (pw * y).astype(np.float32), u0))

    f_s_b = jnp.asarray(np.stack([e[0] for e in eps]))
    pw_b = jnp.asarray(np.stack([e[1] for e in eps]))
    pwy_b = jnp.asarray(np.stack([e[2] for e in eps]))
    u0_b = jnp.asarray(np.stack([e[3] for e in eps]))

    tiled = adapt_binary_pallas_tiled(
        f_s_b, pw_b, pwy_b, u0_b, num_steps=25, lr=0.1, tile=2, interpret=True
    )
    for i, (f_s, pw, pwy, u0) in enumerate(eps):
        ref = adapt_binary_pallas(
            jnp.asarray(f_s), jnp.asarray(pw), jnp.asarray(pwy),
            jnp.asarray(u0), num_steps=25, lr=0.1, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(tiled[i]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
