"""Matching-head parity vs reference modules: conv4d, mutual matching,
NeighConsensus/MatchNet, MMN, WeightAverage, MSBlock, spatial descriptor."""

import numpy as np
import pytest

from tests.ref_compat import HAVE_REF

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference tree not mounted")

import jax
import jax.numpy as jnp

from few_shot_seg_cwt_tpu.config import default_cfg
from few_shot_seg_cwt_tpu.models.conv4d import CenterPivotConv4d, Conv4d
from few_shot_seg_cwt_tpu.models.matching import MatchNet, spatial_descriptor
from few_shot_seg_cwt_tpu.models.mmn import build_mmn
from few_shot_seg_cwt_tpu.models.msm import MSBlock, WeightAverage
from few_shot_seg_cwt_tpu.ops.corr import get_corr, mutual_matching, mutual_nn_filter
from few_shot_seg_cwt_tpu.utils.ckpt import import_matchnet, import_mmn


def _to_nhwc6(x_torch):  # (B, C, h, w, hs, ws) -> (B, h, w, hs, ws, C)
    return x_torch.permute(0, 2, 3, 4, 5, 1).numpy()


def test_get_corr_matches_reference(rng):
    import torch
    from src.model.model_util import get_corr as ref_get_corr

    q = rng.standard_normal((2, 6, 6, 16)).astype(np.float32)
    k = rng.standard_normal((2, 6, 6, 16)).astype(np.float32)
    ref = ref_get_corr(
        torch.from_numpy(q).permute(0, 3, 1, 2), torch.from_numpy(k).permute(0, 3, 1, 2)
    ).numpy()
    got = np.asarray(get_corr(jnp.asarray(q), jnp.asarray(k)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mutual_matching_matches_reference(rng):
    import torch
    from src.model.match import MutualMatching

    x = rng.standard_normal((2, 3, 5, 5, 5, 5)).astype(np.float32)  # torch BCHW..
    ref = MutualMatching(torch.from_numpy(x)).numpy()
    got = np.asarray(mutual_matching(jnp.asarray(x.transpose(0, 2, 3, 4, 5, 1))))
    np.testing.assert_allclose(got.transpose(0, 5, 1, 2, 3, 4), ref, rtol=1e-4, atol=1e-5)


def test_mutual_nn_filter_matches_reference(rng):
    import torch
    from src.model.base.correlation import Correlation

    x = np.abs(rng.standard_normal((2, 25, 25))).astype(np.float32)
    ref = Correlation.mutual_nn_filter(torch.from_numpy(x)).numpy()
    got = np.asarray(mutual_nn_filter(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("stride", [(1, 1, 1, 1), (1, 1, 2, 2)])
def test_center_pivot_conv4d_matches_reference(rng, stride):
    import torch
    from src.model.conv4d import CenterPivotConv4d as RefCPC

    torch.manual_seed(3)
    ref_mod = RefCPC(in_channels=2, out_channels=4, kernel_size=(3,) * 4,
                     stride=stride, padding=(1,) * 4, bias=True)
    ref_mod.eval()
    x = rng.standard_normal((1, 2, 6, 6, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(x)).numpy()

    mod = CenterPivotConv4d(out_channels=4, kernel_size=(3,) * 4,
                            stride=stride, padding=(1,) * 4)
    params = {
        "conv_query": {
            "kernel": ref_mod.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": ref_mod.conv1.bias.detach().numpy(),
        },
        "conv_support": {
            "kernel": ref_mod.conv2.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": ref_mod.conv2.bias.detach().numpy(),
        },
    }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(_to_nhwc6(torch.from_numpy(x)))))
    np.testing.assert_allclose(got.transpose(0, 5, 1, 2, 3, 4), ref, rtol=1e-3, atol=1e-4)


def test_true_conv4d_matches_reference(rng):
    import torch
    from src.model.conv4d import Conv4d as RefConv4d

    torch.manual_seed(4)
    ref_mod = RefConv4d(in_channels=2, out_channels=3, kernel_size=(3,) * 4,
                        padding=(1,) * 4, bias=True)
    ref_mod.eval()
    x = rng.standard_normal((1, 2, 5, 5, 5, 5)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(x)).numpy()

    mod = Conv4d(out_channels=3, kernel_size=(3,) * 4, padding=(1,) * 4)
    # reference pre-permutes weight to (k0, O, I, k1, k2, k3)
    w = ref_mod.weight.detach().numpy().transpose(0, 3, 4, 5, 2, 1)
    params = {"kernel": w, "bias": ref_mod.bias.detach().numpy()}
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(_to_nhwc6(torch.from_numpy(x)))))
    np.testing.assert_allclose(got.transpose(0, 5, 1, 2, 3, 4), ref, rtol=1e-3, atol=1e-4)


def test_matchnet_forward_matches_reference(rng):
    import torch
    from src.model.match import MatchNet as RefMatchNet

    torch.manual_seed(5)
    ref_mod = RefMatchNet(temp=3.0, cv_type="red", in_channel=1, sce=False,
                          cyc=False, sym_mode=True)
    ref_mod.eval()

    fq = rng.standard_normal((1, 16, 6, 6)).astype(np.float32)
    fs = rng.standard_normal((1, 16, 6, 6)).astype(np.float32)
    v = rng.standard_normal((1, 8, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(fq), torch.from_numpy(fs), torch.from_numpy(v),
                      ig_mask=None, ret_corr=False).numpy()

    mod = MatchNet(temp=3.0, cv_type="red", in_channel=1, sym_mode=True)
    variables = import_matchnet(ref_mod.state_dict())
    got = np.asarray(
        mod.apply(
            variables,
            jnp.asarray(fq.transpose(0, 2, 3, 1)),
            jnp.asarray(fs.transpose(0, 2, 3, 1)),
            jnp.asarray(v.transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4)


def test_weight_average_matches_reference(rng):
    import torch
    from src.model.msm import WeightAverage as RefWA

    from few_shot_seg_cwt_tpu.config import Cfg

    torch.manual_seed(6)
    ref_mod = RefWA(8, Cfg({}))
    ref_mod.eval()
    x = rng.standard_normal((2, 8, 5, 5)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(x)).numpy()

    mod = WeightAverage()
    params = {}
    for name in ("conv_theta", "conv_phi", "conv_g", "conv_back"):
        m = getattr(ref_mod, name)
        params[name] = {
            "kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": m.bias.detach().numpy(),
        }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4)


def test_msblock_matches_reference(rng):
    import torch
    from src.model.msm import MSBlock as RefMS

    torch.manual_seed(7)
    ref_mod = RefMS(8, c_out=4, rate=2)
    ref_mod.eval()
    x = rng.standard_normal((1, 8, 7, 7)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(x)).numpy()

    mod = MSBlock(c_out=4, rate=2)
    params = {}
    for name in ("conv", "conv1", "conv2", "conv3"):
        m = getattr(ref_mod, name)
        params[name] = {
            "kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": m.bias.detach().numpy(),
        }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4)


def test_spatial_descriptor_matches_reference(rng):
    import torch
    from src.model.base.spatial_context import generate_spatial_descriptor

    x = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    ref = generate_spatial_descriptor(torch.from_numpy(x), kernel_size=3).detach().numpy()
    got = np.asarray(spatial_descriptor(jnp.asarray(x.transpose(0, 2, 3, 1)), 3))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4)


def test_mmn_matches_reference(rng):
    import torch
    from src.model.mmn import MMN as RefMMN

    cfg = default_cfg()
    cfg.rmid = "l34"
    cfg.all_lr = "l"
    cfg.temp = 3.0
    cfg.att_wt = 0.3
    torch.manual_seed(8)
    ref_mod = RefMMN(cfg, agg="cat", wa=False, red_dim=False)
    ref_mod.eval()

    shot, h, w = 2, 5, 5
    # block features: layer3 has 6 blocks (all_lr includes 3? 'l' -> only last)
    fq_lst = {
        3: [torch.from_numpy(rng.standard_normal((1, 1024, h, w)).astype(np.float32))],
        4: [torch.from_numpy(rng.standard_normal((1, 2048, h, w)).astype(np.float32))],
    }
    fs_lst = {
        3: [torch.from_numpy(rng.standard_normal((shot, 1024, h, w)).astype(np.float32))],
        4: [torch.from_numpy(rng.standard_normal((shot, 2048, h, w)).astype(np.float32))],
    }
    f_q = torch.from_numpy(rng.standard_normal((1, 512, h, w)).astype(np.float32))
    f_s = torch.from_numpy(rng.standard_normal((shot, 512, h, w)).astype(np.float32))
    with torch.no_grad():
        ref_fq, ref_att = ref_mod(fq_lst, fs_lst, f_q, f_s)

    mod = build_mmn(cfg)
    variables = import_mmn(ref_mod.state_dict())
    to_nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    got_fq, got_att = mod.apply(
        variables,
        {k: [to_nhwc(f) for f in v] for k, v in fq_lst.items()},
        {k: [to_nhwc(f) for f in v] for k, v in fs_lst.items()},
        to_nhwc(f_q), to_nhwc(f_s),
    )
    np.testing.assert_allclose(
        np.asarray(got_fq).transpose(0, 3, 1, 2), ref_fq.numpy(), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("stride", [(1, 1, 1, 1), (1, 1, 2, 2)])
def test_center_pivot_swap_roles_identity(rng, stride):
    """swap_roles=True must equal swap(conv(swap(x))) — the identity the
    symmetric NeighConsensus chain (and the Pallas pivot path) relies on."""
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 6, 3)).astype(np.float32))
    mod = CenterPivotConv4d(out_channels=4, stride=stride)
    variables = mod.init(jax.random.PRNGKey(0), x)
    swap = lambda t: t.transpose(0, 3, 4, 1, 2, 5)
    got = mod.apply(variables, x, True)
    want = swap(mod.apply(variables, swap(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_true_conv4d_swap_roles_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 5, 5, 5, 5, 2)).astype(np.float32))
    mod = Conv4d(out_channels=3)
    variables = mod.init(jax.random.PRNGKey(0), x)
    swap = lambda t: t.transpose(0, 3, 4, 1, 2, 5)
    got = mod.apply(variables, x, True)
    want = swap(mod.apply(variables, swap(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_neigh_consensus_symmetric_grads_flow(rng):
    """Symmetric mode (swap-roles chains + per-block remat) must be
    differentiable and use each conv param in both orientations."""
    x = jnp.asarray(rng.standard_normal((1, 5, 5, 5, 5, 2)).astype(np.float32))
    from few_shot_seg_cwt_tpu.models.matching import NeighConsensus

    mod = NeighConsensus(kernel_sizes=(3, 3), channels=(4, 1),
                         symmetric_mode=True)
    variables = mod.init(jax.random.PRNGKey(1), x)

    def loss(v, t):
        return jnp.mean(mod.apply(v, t) ** 2)

    g = jax.grad(loss)(variables, x)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # every kernel participates in both chains; grads must be nonzero
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(n > 0 for n in norms), norms


def test_conv4d_custom_vjp_matches_autodiff(rng):
    """conv4d's custom VJP (flipped-kernel dx + scanned 2D-kernel-grad dk —
    the 473px CHM compile fix) must equal plain autodiff of the forward,
    on deliberately distinct spatial dims, multi-channel, both kernel
    sizes used by CHM (3 and 5)."""
    import jax
    import jax.numpy as jnp

    from few_shot_seg_cwt_tpu.models.conv4d import _conv4d, _conv4d_fwd

    for ksz, dims, ci, co in ((3, (2, 4, 5, 6, 7), 2, 3),
                              (5, (1, 6, 7, 8, 9), 1, 1)):
        b, h, w, hs, ws = dims
        x = jnp.asarray(rng.standard_normal((b, h, w, hs, ws, ci))
                        .astype(np.float32))
        k = jnp.asarray(rng.standard_normal((ksz,) * 4 + (ci, co))
                        .astype(np.float32))
        t = jnp.asarray(rng.standard_normal((b, h, w, hs, ws, co))
                        .astype(np.float32))

        gx, gk = jax.grad(lambda x_, k_: jnp.sum(_conv4d(x_, k_) * t),
                          argnums=(0, 1))(x, k)
        rx, rk = jax.grad(lambda x_, k_: jnp.sum(_conv4d_fwd(x_, k_) * t),
                          argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-4, err_msg=f"dx k={ksz}")
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                                   rtol=1e-4, atol=1e-4, err_msg=f"dk k={ksz}")
