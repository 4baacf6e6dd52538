"""Parity: attention zoo, fusion nets, and episode utils vs the reference."""

import numpy as np
import pytest

from tests.ref_compat import HAVE_REF

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference tree not mounted")

import jax
import jax.numpy as jnp

from few_shot_seg_cwt_tpu.models.att_zoo import MHA, AttentionBlock, CrossAttention
from few_shot_seg_cwt_tpu.models.fusion import DynamicFusion, FuseNet1
from few_shot_seg_cwt_tpu.ops.corr import get_corr
from few_shot_seg_cwt_tpu.ops.episode_utils import (
    adapt_reset_spt_label_np,
    att_weighted_out,
    compress_pred,
    get_ig_mask,
    outer_forward,
    reset_spt_label,
)


def _lin(m):
    p = {"kernel": m.weight.detach().numpy().T}
    if m.bias is not None:
        p["bias"] = m.bias.detach().numpy()
    return p


def _ln(m):
    return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


def _conv(m):
    p = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if m.bias is not None:
        p["bias"] = m.bias.detach().numpy()
    return p


def test_cross_attention_matches_reference(rng):
    import torch
    from src.model.transformer import CrossAttention as RefCA

    torch.manual_seed(20)
    ref = RefCA(4, 32, 16, ln="ln", fv="fv", fc="fc")
    ref.eval()
    k = rng.standard_normal((2, 9, 32)).astype(np.float32)
    v = rng.standard_normal((2, 9, 16)).astype(np.float32)
    q = rng.standard_normal((2, 5, 32)).astype(np.float32)
    idt = rng.standard_normal((2, 5, 16)).astype(np.float32)
    mask = (rng.random((2, 9)) < 0.3).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(k), torch.from_numpy(v),
                         torch.from_numpy(q), torch.from_numpy(idt),
                         torch.from_numpy(mask))

    mod = CrossAttention(n_head=4, dim=32, dim_v=16, ln="ln", fv="fv", fc="fc")
    params = {
        "qk_fc": _lin(ref.qk_fc), "v_fc": _lin(ref.v_fc), "fc": _lin(ref.fc),
        "layer_norm_q": _ln(ref.layer_norm_q), "layer_norm_k": _ln(ref.layer_norm_k),
        "layer_norm": _ln(ref.layer_norm),
    }
    got, _ = mod.apply({"params": params}, jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(q), jnp.asarray(idt), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(), rtol=1e-3, atol=1e-4)


def test_mha_matches_reference(rng):
    import torch
    from src.model.transformer import MHA as RefMHA

    torch.manual_seed(21)
    ref = RefMHA(4, 32, 16, fv=True, fc=True)
    ref.eval()
    k = rng.standard_normal((1, 9, 32)).astype(np.float32)
    v = rng.standard_normal((1, 9, 16)).astype(np.float32)
    q = rng.standard_normal((1, 5, 32)).astype(np.float32)
    idt = rng.standard_normal((1, 5, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(k), torch.from_numpy(v),
                         torch.from_numpy(q), torch.from_numpy(idt), None)

    mod = MHA(n_head=4, dim=32, dim_v=16)
    params = {
        "qk_fc": _lin(ref.qk_fc), "v_fc": _lin(ref.v_fc), "proj": _lin(ref.proj),
        "norm1_q": _ln(ref.norm1_q), "norm1_k": _ln(ref.norm1_k),
        "norm1_v": _ln(ref.norm1_v),
    }
    got, _ = mod.apply({"params": params}, jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(q), jnp.asarray(idt), None)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(), rtol=1e-3, atol=1e-4)


def test_attention_block_matches_reference(rng):
    import torch
    from src.model.transformer import AttentionBlock as RefAB

    torch.manual_seed(22)
    ref = RefAB(n_head=1, dim=32, dim_v=16, v_norm="vn", mode="l", scale_att="sc")
    ref.eval()
    k = rng.standard_normal((1, 9, 32)).astype(np.float32)
    v = rng.standard_normal((1, 9, 16)).astype(np.float32)
    q = rng.standard_normal((1, 5, 32)).astype(np.float32)
    idt = rng.standard_normal((1, 5, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(k), torch.from_numpy(v),
                         torch.from_numpy(q), torch.from_numpy(idt), None)

    mod = AttentionBlock(dim=32, dim_v=16, v_norm="vn", mode="l", scale_att="sc")
    params = {
        "qk_fc": _lin(ref.qk_fc),
        "scale_att": ref.scale_att.detach().numpy().reshape(()),
        "att_wt": {"weight": ref.att_wt.weight.detach().numpy().reshape(())},
        "org_wt": {"weight": ref.org_wt.weight.detach().numpy().reshape(())},
    }
    got, _ = mod.apply({"params": params}, jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(q), jnp.asarray(idt), None)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(), rtol=1e-3, atol=1e-4)


def test_get_ig_mask_matches_reference(rng):
    import torch
    from src.model.model_util import get_ig_mask as ref_ig

    h = w = 60
    sim = rng.standard_normal((1, h * w, h * w)).astype(np.float32)
    s_label = rng.integers(0, 2, size=(1, 473, 473)).astype(np.int64)
    s_label[0, :40] = 255
    q_label = rng.integers(0, 2, size=(1, 473, 473)).astype(np.int64)
    pd_q0 = rng.standard_normal((1, 2, h, w)).astype(np.float32)
    pd_s = rng.standard_normal((1, 2, h, w)).astype(np.float32)

    ref = ref_ig(torch.from_numpy(sim.copy()), torch.from_numpy(s_label),
                 torch.from_numpy(q_label), torch.from_numpy(pd_q0),
                 torch.from_numpy(pd_s)).numpy()
    got = np.asarray(get_ig_mask(
        jnp.asarray(sim), jnp.asarray(s_label.astype(np.int32)),
        jnp.asarray(q_label.astype(np.int32)),
        jnp.asarray(pd_q0.transpose(0, 2, 3, 1)),
        jnp.asarray(pd_s.transpose(0, 2, 3, 1)),
    ))
    assert got.shape == ref.shape
    agree = (got == ref).mean()
    assert agree > 0.999, agree  # quantile interpolation boundary may differ on ties


def test_att_weighted_out_matches_reference(rng):
    import torch
    from src.model.model_util import att_weighted_out as ref_awo

    h = w = 6
    sim = rng.standard_normal((1, h * w, h * w)).astype(np.float32)
    v = rng.standard_normal((1, 8, h, w)).astype(np.float32)
    ig = (rng.random((1, h * w)) < 0.3)

    ref = ref_awo(torch.from_numpy(sim.copy()), torch.from_numpy(v), temp=20.0,
                  ig_mask=torch.from_numpy(ig)).numpy()
    got = np.asarray(att_weighted_out(
        jnp.asarray(sim), jnp.asarray(v.transpose(0, 2, 3, 1)), temp=20.0,
        ig_mask=jnp.asarray(ig),
    ))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4)


def test_compress_and_reset_labels(rng):
    import torch
    from src.model.model_util import compress_pred as ref_cp
    from src.model.model_util import reset_spt_label as ref_rs

    pred = rng.standard_normal((1, 5, 4, 4)).astype(np.float32)
    ref = ref_cp(torch.from_numpy(pred), 3).numpy()
    got = np.asarray(compress_pred(jnp.asarray(pred.transpose(0, 2, 3, 1)), 3))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)

    s_label = rng.integers(0, 2, size=(1, 8, 8)).astype(np.int64)
    pred2 = rng.standard_normal((1, 5, 8, 8)).astype(np.float32)
    ref2 = ref_rs(torch.from_numpy(s_label.copy()), torch.from_numpy(pred2.copy()), 4).numpy()
    got2 = np.asarray(reset_spt_label(
        jnp.asarray(s_label.astype(np.int32)),
        jnp.asarray(pred2.transpose(0, 2, 3, 1)), 4,
    ))
    np.testing.assert_array_equal(got2, ref2)


def test_adapt_reset_spt_label_matches_reference(rng):
    import torch
    from src.model.model_util import adapt_reset_spt_label as ref_ar

    s_label = rng.integers(0, 2, size=(1, 60, 60)).astype(np.int64)
    pred = rng.standard_normal((1, 6, 60, 60)).astype(np.float32)
    pre_wt = rng.standard_normal((6, 8)).astype(np.float32)

    ref_lab, ref_wts, ref_n = ref_ar(
        torch.from_numpy(s_label.copy()), torch.from_numpy(pred.copy()),
        torch.from_numpy(pre_wt), 6, sub_cls=2,
    )
    got_lab, got_wts, got_n = adapt_reset_spt_label_np(
        s_label.copy(), pred.transpose(0, 2, 3, 1).copy(), pre_wt, 6, sub_cls=2
    )
    np.testing.assert_array_equal(got_lab, ref_lab.numpy())
    assert got_n == ref_n
    assert len(got_wts) == len(ref_wts)


def test_outer_forward_matches_reference(rng):
    import torch
    from src.model.model_util import get_corr as ref_get_corr
    from src.model.model_util import get_ig_mask as ref_ig

    h = w = 60
    c, c2 = 8, 16
    f_q = rng.standard_normal((1, c, h, w)).astype(np.float32)
    f_s = rng.standard_normal((1, c, h, w)).astype(np.float32)
    fq_fea = rng.standard_normal((1, c2, h, w)).astype(np.float32)
    fs_fea = rng.standard_normal((1, c2, h, w)).astype(np.float32)
    s_label = rng.integers(0, 2, size=(1, 473, 473)).astype(np.int64)
    q_label = rng.integers(0, 2, size=(1, 473, 473)).astype(np.int64)
    pd_q0 = rng.standard_normal((1, 2, h, w)).astype(np.float32)
    pd_s = rng.standard_normal((1, 2, h, w)).astype(np.float32)
    gamma = 0.2
    temp = 20.0

    # torch restatement of pspnet.outer_forward's pre-classifier blend
    tq = torch.from_numpy
    sim = ref_get_corr(tq(fq_fea), tq(fs_fea))
    ig = ref_ig(sim, tq(s_label), tq(q_label), tq(pd_q0), tq(pd_s))
    sim[ig.unsqueeze(1).expand(sim.shape)] = 1e-5
    attn = torch.softmax(sim * temp, dim=-1)
    wv = torch.bmm(tq(f_s).view(1, c, -1), attn.permute(0, 2, 1)).view(1, c, h, w)
    ref_out = ((wv * gamma + tq(f_q)) / (1 + gamma)).numpy()

    got, _, _ = outer_forward(
        jnp.asarray(f_q.transpose(0, 2, 3, 1)),
        jnp.asarray(f_s.transpose(0, 2, 3, 1)),
        jnp.asarray(fq_fea.transpose(0, 2, 3, 1)),
        jnp.asarray(fs_fea.transpose(0, 2, 3, 1)),
        jnp.asarray(s_label.astype(np.int32)),
        jnp.asarray(q_label.astype(np.int32)),
        jnp.asarray(pd_q0.transpose(0, 2, 3, 1)),
        jnp.asarray(pd_s.transpose(0, 2, 3, 1)),
        jnp.asarray(gamma), temp=temp,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref_out, rtol=1e-3, atol=2e-4
    )


def test_dynamic_fusion_matches_reference(rng):
    import torch
    from src.model.transformer import DynamicFusion as RefDF

    torch.manual_seed(23)
    ref = RefDF(im_size=3, mid_dim=8)
    ref.eval()
    corr = rng.standard_normal((1, 6, 6, 6, 6)).astype(np.float32)
    s_mask = rng.random((1, 1, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(corr), torch.from_numpy(s_mask)).numpy()

    mod = DynamicFusion(im_size=3, mid_dim=8)
    params = {
        "conv4d": {
            "conv_query": _conv(ref.conv4d.conv1),
            "conv_support": _conv(ref.conv4d.conv2),
        },
        "att": {"att0": _conv(ref.att[0]), "att1": _conv(ref.att[2])},
    }
    got = np.asarray(mod.apply(
        {"params": params}, jnp.asarray(corr), jnp.asarray(s_mask.transpose(0, 2, 3, 1))
    ))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref_out, rtol=1e-3, atol=1e-4)


def test_fusenet1_matches_reference(rng):
    import torch
    from src.model.transformer import FuseNet1 as RefFN

    torch.manual_seed(24)
    ref = RefFN(im_size=3, mid_dim=8)
    ref.eval()
    corrs = [rng.standard_normal((1, 6, 6, 6, 6)).astype(np.float32) for _ in range(2)]
    s_mask = rng.random((1, 1, 6, 6)).astype(np.float32)
    pds = [rng.standard_normal((1, 2, 6, 6)).astype(np.float32) for _ in range(2)]
    with torch.no_grad():
        ref_out = ref([torch.from_numpy(c) for c in corrs], torch.from_numpy(s_mask),
                      [torch.from_numpy(p) for p in pds]).numpy()

    mod = FuseNet1(im_size=3, mid_dim=8)
    params = {
        "conv4d": {
            "c0": {"conv_query": _conv(ref.conv4d[0].conv1),
                   "conv_support": _conv(ref.conv4d[0].conv2)},
            "c1": {"conv_query": _conv(ref.conv4d[2].conv1),
                   "conv_support": _conv(ref.conv4d[2].conv2)},
        },
        "att": {"att0": _conv(ref.att[0]), "att1": _conv(ref.att[2])},
    }
    got = np.asarray(mod.apply(
        {"params": params}, [jnp.asarray(c) for c in corrs],
        jnp.asarray(s_mask.transpose(0, 2, 3, 1)),
        [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in pds],
    ))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref_out, rtol=1e-3, atol=1e-4)


def test_matchnet_cyc_path_runs(rng):
    """cyc=True (cycle-consistency mask) must init and apply cleanly."""
    from few_shot_seg_cwt_tpu.models.matching import MatchNet

    mod = MatchNet(temp=3.0, cyc=True)
    fq = jnp.asarray(rng.standard_normal((1, 5, 5, 8)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((1, 5, 5, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 5, 5, 4)).astype(np.float32))
    s_mask = jnp.asarray(rng.integers(0, 2, size=(1, 5, 5)).astype(np.int32))
    variables = mod.init(jax.random.PRNGKey(0), fq, fs, v, s_mask=s_mask,
                         use_cyc=True)
    out = mod.apply(variables, fq, fs, v, s_mask=s_mask, use_cyc=True,
                    deterministic=True)
    assert np.isfinite(np.asarray(out)).all()


def test_detr_drop_path_runs(rng):
    """drop=True (adjust-feature dropout) must init and apply cleanly."""
    from few_shot_seg_cwt_tpu.models.detr import DeTr

    mod = DeTr(rmid="l4", reduce_dim=16, drop=True)
    fq_feats = {4: [jnp.asarray(rng.standard_normal((1, 5, 5, 32)).astype(np.float32))]}
    fs_feats = {4: [jnp.asarray(rng.standard_normal((1, 5, 5, 32)).astype(np.float32))]}
    f_q = jnp.asarray(rng.standard_normal((1, 5, 5, 16)).astype(np.float32))
    f_s = jnp.asarray(rng.standard_normal((1, 5, 5, 16)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), fq_feats, fs_feats, f_q, f_s)
    out, _, _ = mod.apply(variables, fq_feats, fs_feats, f_q, f_s,
                          deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out)).all()


def test_coscls_weightnorm_import_matches_reference(rng):
    """CosCls with WeightNorm ('r' cls_type): import + forward parity."""
    import torch
    from src.model.pspnet import CosCls as RefCosCls

    torch.manual_seed(31)
    ref = RefCosCls(in_dim=8, n_classes=3, cls_type="ro0o")
    ref.eval()
    x = rng.standard_normal((1, 8, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    from few_shot_seg_cwt_tpu.models.pspnet import CosCls
    from few_shot_seg_cwt_tpu.utils.ckpt import import_pspnet

    sd = {f"classifier.{k}": v for k, v in ref.state_dict().items()}
    tree = import_pspnet(sd)
    mod = CosCls(in_dim=8, n_classes=3, cls_type="ro0o")
    got = np.asarray(mod.apply({"params": tree["params"]["classifier"]},
                               jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref_out, rtol=1e-4, atol=1e-5)
