"""Interpret-mode parity of the MXU (dot-form) Pallas pivot kernel
(ops/pallas_pivot_mxu.py) against the XLA CenterPivotConv4d math: forward
(with/without fused relu), the custom VJP, and the impl selector routing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from few_shot_seg_cwt_tpu.models.conv4d import CenterPivotConv4d
from few_shot_seg_cwt_tpu.ops.pallas_pivot import HAVE_PALLAS, pivot_impl
from few_shot_seg_cwt_tpu.ops.pallas_pivot_mxu import pivot_conv_flat_mxu

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")

DIMS = (5, 6, 4, 7)   # deliberately non-square: hq, wq, hs, ws all distinct
CI, CO, B = 3, 4, 2


def _setup(rng):
    hq, wq, hs, ws = DIMS
    x6 = rng.standard_normal((B, hq, wq, hs, ws, CI)).astype(np.float32)
    wa = rng.standard_normal((3, 3, CI, CO)).astype(np.float32)
    wb = rng.standard_normal((3, 3, CI, CO)).astype(np.float32)
    bias = rng.standard_normal((CO,)).astype(np.float32)
    xf = jnp.asarray(
        x6.transpose(0, 5, 1, 2, 3, 4).reshape(B, CI, hq * wq, hs * ws))
    return x6, xf, jnp.asarray(wa), jnp.asarray(wb), jnp.asarray(bias)


def _ref_apply(x6, wa, wb, bias, relu):
    mod = CenterPivotConv4d(out_channels=CO)
    params = {"params": {
        "conv_query": {"kernel": wa, "bias": bias * 0.25},
        "conv_support": {"kernel": wb, "bias": bias * 0.75},
    }}
    y = mod.apply(params, jnp.asarray(x6))
    return jax.nn.relu(y) if relu else y


def _to_flat(y6):
    hq, wq, hs, ws = DIMS
    return np.asarray(y6).transpose(0, 5, 1, 2, 3, 4).reshape(
        B, CO, hq * wq, hs * ws)


@pytest.mark.parametrize("relu", [False, True])
def test_mxu_forward_matches_xla(rng, relu):
    x6, xf, wa, wb, bias = _setup(rng)
    ref = _to_flat(_ref_apply(x6, wa, wb, bias, relu))
    got = np.asarray(pivot_conv_flat_mxu(xf, wa, wb, bias, dims=DIMS,
                                         relu=relu, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mxu_vjp_matches_autodiff(rng):
    x6, xf, wa, wb, bias = _setup(rng)
    hq, wq, hs, ws = DIMS
    t = jnp.asarray(rng.standard_normal((B, CO, hq * wq, hs * ws))
                    .astype(np.float32))

    def _to_flat_j(y6):
        return y6.transpose(0, 5, 1, 2, 3, 4).reshape(B, CO, hq * wq, hs * ws)

    def loss_ref(x6_, wa_, wb_, b_):
        y = _ref_apply(x6_, wa_, wb_, b_, relu=True)
        return jnp.sum(_to_flat_j(y) * t)

    def loss_mxu(xf_, wa_, wb_, b_):
        y = pivot_conv_flat_mxu(xf_, wa_, wb_, b_, dims=DIMS, relu=True,
                                interpret=True)
        return jnp.sum(y * t)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        jnp.asarray(x6), wa, wb, bias)
    gm = jax.grad(loss_mxu, argnums=(0, 1, 2, 3))(xf, wa, wb, bias)

    gx_ref = np.asarray(gr[0]).transpose(0, 5, 1, 2, 3, 4).reshape(
        B, CI, hq * wq, hs * ws)
    np.testing.assert_allclose(np.asarray(gm[0]), gx_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gm[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gm[2]), np.asarray(gr[2]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gm[3]), np.asarray(gr[3]),
                               rtol=1e-4, atol=1e-4)


def test_impl_selector(monkeypatch):
    """FSS_PIVOT_PALLAS=1 -> vpu; FSS_PIVOT_MXU=1 / interpret-only -> mxu;
    no flags off-TPU -> None; FSS_DISABLE_PALLAS kills all."""
    for var in ("FSS_PIVOT_PALLAS", "FSS_PIVOT_MXU", "FSS_PIVOT_INTERPRET",
                "FSS_DISABLE_PALLAS"):
        monkeypatch.delenv(var, raising=False)
    assert pivot_impl() is None  # CPU test process, nothing forced
    monkeypatch.setenv("FSS_PIVOT_INTERPRET", "1")
    assert pivot_impl() == "mxu"
    monkeypatch.setenv("FSS_PIVOT_MXU", "1")
    assert pivot_impl() == "mxu"
    monkeypatch.setenv("FSS_PIVOT_PALLAS", "1")
    assert pivot_impl() == "vpu"  # explicit vpu wins over mxu
    monkeypatch.setenv("FSS_DISABLE_PALLAS", "1")
    assert pivot_impl() is None


def test_flat_consensus_routes_through_mxu(rng, monkeypatch):
    """NeighConsensus flat path under interpret-only env (which selects the
    mxu formulation) must equal the 6D XLA path — symmetric mode,
    multi-block, both chains."""
    from few_shot_seg_cwt_tpu.models.matching import NeighConsensus

    hq, wq, hs, ws = DIMS
    x6 = jnp.asarray(
        rng.standard_normal((1, hq, wq, hs, ws, 2)).astype(np.float32))
    mod = NeighConsensus(kernel_sizes=(3, 3), channels=(3, 1),
                         symmetric_mode=True)
    variables = mod.init(jax.random.PRNGKey(0), x6)
    want = mod.apply(variables, x6)

    xf = x6.transpose(0, 5, 1, 2, 3, 4).reshape(1, 2, hq * wq, hs * ws)
    monkeypatch.delenv("FSS_PIVOT_PALLAS", raising=False)
    monkeypatch.setenv("FSS_PIVOT_INTERPRET", "1")
    assert pivot_impl() == "mxu"
    got = mod.apply(variables, xf, flat_dims=DIMS)
    got6 = np.asarray(got).reshape(1, 1, hq, wq, hs, ws).transpose(
        0, 2, 3, 4, 5, 1)
    np.testing.assert_allclose(got6, np.asarray(want), rtol=1e-4, atol=1e-5)
