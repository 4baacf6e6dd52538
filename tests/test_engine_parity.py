"""End-to-end episodic pipeline parity vs the composed reference modules.

Replays one full eval episode — backbone features, 25-step inner loop, CWT
weight update, query prediction — through both the reference torch modules
(random init, weights shared via the importer) and the jitted JAX engine,
and requires matching query logits. This is the reference's test.py:148-204
inner body for one task.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference tree not mounted"
)

# reuse the torchvision stub + path setup
import tests.test_model_parity  # noqa: F401

import jax
import jax.numpy as jnp

from few_shot_seg_cwt_tpu.config import default_cfg
from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
from few_shot_seg_cwt_tpu.models import build_cwt, build_pspnet
from few_shot_seg_cwt_tpu.utils.ckpt import import_cwt, import_pspnet


def test_full_eval_episode_parity():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from src.model.pspnet import PSPNet as TorchPSPNet
    from src.model.transformer import MultiHeadAttentionOne as TorchMHA

    torch.manual_seed(2021)
    cfg = default_cfg()
    cfg.pretrained = False
    cfg.image_size = 57
    cfg.adapt_iter = 25
    cfg.cls_lr = 0.1
    cfg.heads = 1

    model = TorchPSPNet(cfg, zoom_factor=8, use_ppm=True)
    model.eval()
    trans = TorchMHA(cfg.heads, 512, 512, 512, dropout=0.5)
    trans.eval()

    rng = np.random.default_rng(5)
    shot = 1
    s_img = rng.standard_normal((shot, 57, 57, 3)).astype(np.float32)
    q_img = rng.standard_normal((57, 57, 3)).astype(np.float32)
    s_label = rng.integers(0, 2, size=(shot, 57, 57)).astype(np.int32)
    s_label[0, :5, :5] = 255
    w0 = rng.uniform(-1 / np.sqrt(512), 1 / np.sqrt(512), size=(2, 512)).astype(np.float32)

    # ---------------- torch reference composition ----------------
    with torch.no_grad():
        f_s, _ = model.extract_features(torch.from_numpy(s_img).permute(0, 3, 1, 2))
    cls = nn.Conv2d(512, 2, kernel_size=1, bias=False)
    with torch.no_grad():
        cls.weight.copy_(torch.from_numpy(w0).reshape(2, 512, 1, 1))
    opt = torch.optim.SGD(cls.parameters(), lr=cfg.cls_lr)
    lbl = torch.from_numpy(s_label).long()
    n_bg, n_fg = float((lbl == 0).sum()), float((lbl == 1).sum())
    crit = nn.CrossEntropyLoss(weight=torch.tensor([1.0, n_bg / n_fg]), ignore_index=255)
    for _ in range(cfg.adapt_iter):
        out = F.interpolate(cls(f_s), size=(57, 57), mode="bilinear", align_corners=True)
        loss = crit(out, lbl)
        opt.zero_grad()
        loss.backward()
        opt.step()
    with torch.no_grad():
        f_q, _ = model.extract_features(torch.from_numpy(q_img[None]).permute(0, 3, 1, 2))
        pred_q0_ref = cls(f_q).permute(0, 2, 3, 1).numpy()[0]
        f_qn = F.normalize(f_q, dim=1)
        w = cls.weight.data.squeeze().unsqueeze(0)  # (1, 2, 512)
        w_upd = trans(w, f_qn, f_qn)
        pred_q_ref = torch.matmul(
            w_upd, f_qn.view(1, 512, -1)
        ).view(1, 2, f_q.shape[-2], f_q.shape[-1]).permute(0, 2, 3, 1).numpy()[0]

    # ---------------- JAX engine ----------------
    engine = EpisodicEngine(cfg)
    vars_b = import_pspnet(model.state_dict())
    vars_t = import_cwt(trans.state_dict())
    episode = {
        "s_img": jnp.asarray(s_img),
        "s_label": jnp.asarray(s_label),
        "q_img": jnp.asarray(q_img),
        "q_label": jnp.zeros((57, 57), jnp.int32),
        "cls": jnp.asarray(1, jnp.int32),
    }
    out = jax.jit(engine.eval_episode_from_w0)(vars_b, vars_t, episode, jnp.asarray(w0))
    got_q = np.asarray(out["pred_q"])
    got_q0 = np.asarray(out["pred_q0"])

    np.testing.assert_allclose(got_q0, pred_q0_ref, rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(got_q, pred_q_ref, rtol=1e-2, atol=2e-3)
    # the two predictions must agree on almost every pixel's argmax
    agree = (got_q.argmax(-1) == pred_q_ref.argmax(-1)).mean()
    assert agree > 0.995, agree
