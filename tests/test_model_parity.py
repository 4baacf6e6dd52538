"""Numerical parity of flax models vs the reference PyTorch implementation.

These tests instantiate the *actual reference modules* (mounted read-only at
/root/reference), push their randomly-initialized weights through the
checkpoint importer, and require the JAX forward pass to match the torch
forward pass. They are skipped when the reference tree is unavailable.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference tree not mounted"
)

if os.path.isdir(os.path.join(REF, "src")):
    sys.path.insert(0, REF)
    # torchvision is absent in this environment; the reference only needs the
    # import to resolve (its vgg/transform helpers are not exercised here).
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.functional = types.ModuleType("torchvision.transforms.functional")
        tv.transforms.ColorJitter = object
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms.functional"] = tv.transforms.functional

from few_shot_seg_cwt_tpu.config import default_cfg
from few_shot_seg_cwt_tpu.models import build_cwt, build_pspnet
from few_shot_seg_cwt_tpu.utils.ckpt import import_cwt, import_pspnet


@pytest.fixture(scope="module")
def torch_pspnet():
    import torch
    from src.model.pspnet import PSPNet as TorchPSPNet

    torch.manual_seed(2021)
    cfg = default_cfg()
    cfg.pretrained = False
    model = TorchPSPNet(cfg, zoom_factor=8, use_ppm=True)
    model.eval()
    return model, cfg


def test_extract_features_parity(torch_pspnet):
    import torch

    model, cfg = torch_pspnet
    x = np.random.default_rng(0).standard_normal((1, 57, 57, 3)).astype(np.float32)

    with torch.no_grad():
        ref_feat, _ = model.extract_features(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref_feat.permute(0, 2, 3, 1).numpy()

    variables = import_pspnet(model.state_dict())
    net = build_pspnet(cfg)
    got = np.asarray(
        net.apply(variables, jnp.asarray(x), train=False, method=net.extract_features)[0]
    )
    assert got.shape == ref.shape == (1, 8, 8, 512)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_full_forward_parity(torch_pspnet):
    import torch

    model, cfg = torch_pspnet
    x = np.random.default_rng(1).standard_normal((1, 57, 57, 3)).astype(np.float32)

    with torch.no_grad():
        ref_logits = model(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref_logits.permute(0, 2, 3, 1).numpy()

    variables = import_pspnet(model.state_dict())
    net = build_pspnet(cfg)
    got = np.asarray(net.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == ref.shape == (1, 57, 57, cfg.num_classes_tr)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_block_features_parity(torch_pspnet):
    """Per-block trunk features (MMN inputs) match get_feat_list."""
    import torch

    model, cfg = torch_pspnet
    x = np.random.default_rng(2).standard_normal((1, 57, 57, 3)).astype(np.float32)

    with torch.no_grad():
        _, ref_feats = model.get_feat_list(torch.from_numpy(x).permute(0, 3, 1, 2))

    variables = import_pspnet(model.state_dict())
    net = build_pspnet(cfg)
    _, feats = net.apply(
        variables, jnp.asarray(x), train=False, method=net.extract_features
    )
    # reference records the last block of each of layers 2,3,4 with all_lr='l'
    for lid in (2, 3, 4):
        ref = ref_feats[lid][-1].permute(0, 2, 3, 1).numpy()
        got = np.asarray(feats[lid][-1])
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_cwt_transformer_parity():
    import torch
    from src.model.transformer import MultiHeadAttentionOne as TorchMHA

    torch.manual_seed(7)
    heads, dim = 4, 64
    ref_mod = TorchMHA(heads, dim, dim, dim, dropout=0.5)
    ref_mod.eval()

    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 3, dim)).astype(np.float32)
    kv = rng.standard_normal((2, dim, 5, 5)).astype(np.float32)  # torch NCHW

    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv)).numpy()

    from few_shot_seg_cwt_tpu.models import MultiHeadAttentionOne

    net = MultiHeadAttentionOne(n_head=heads, d_model=dim, d_k=dim, d_v=dim, dropout=0.5)
    variables = import_cwt(ref_mod.state_dict())
    kv_nhwc = jnp.asarray(kv.transpose(0, 2, 3, 1))
    got = np.asarray(
        net.apply(variables, jnp.asarray(q), kv_nhwc, kv_nhwc, deterministic=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_vgg_backbone_parity():
    import torch
    from src.model.pspnet import PSPNet as TorchPSPNet

    torch.manual_seed(11)
    cfg = default_cfg()
    cfg.arch = "vgg"
    cfg.pretrained = False
    try:
        model = TorchPSPNet(cfg, zoom_factor=8, use_ppm=True)
    except Exception as e:  # torchvision missing vgg weights etc.
        pytest.skip(f"reference vgg unavailable: {e}")
    model.eval()

    x = np.random.default_rng(4).standard_normal((1, 57, 57, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feat, _ = model.extract_features(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref_feat.permute(0, 2, 3, 1).numpy()

    from few_shot_seg_cwt_tpu.utils.ckpt import import_pspnet_vgg

    variables = import_pspnet_vgg(model.state_dict())
    net = build_pspnet(cfg)
    got = np.asarray(
        net.apply(variables, jnp.asarray(x), train=False, method=net.extract_features)[0]
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)
