"""Rank-4 (B, Q, S, C) consensus route vs the 6D reference math.

The rank-4 route (models/matching.py ncons_r4_active) is the default TPU
path for center-pivot consensus stacks: identical math to the 6D pipeline,
re-laid-out so every transpose stays a fast rank-4 permutation. These tests
pin exactness (forward AND parameter gradients) against the 6D route, and
that the block_remat knob changes nothing numerically.
"""

import os

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from few_shot_seg_cwt_tpu.models.matching import (MatchNet, NeighConsensus,
                                                  ncons_r4_active)

B, H = 1, 6
Q = S = H * H


def _vol(c, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, c, Q, S), jnp.float32)


def _force_6d(monkeypatch):
    monkeypatch.setenv("FSS_NCONS_R4", "0")


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("block_remat", [False, True])
def test_run_match_model_flat_r4_matches_6d(monkeypatch, channels, block_remat):
    assert ncons_r4_active("red")
    net = MatchNet(temp=3.0, cv_type="red", in_channel=channels,
                   block_remat=block_remat)
    corr = _vol(channels)
    variables = net.init(jax.random.PRNGKey(1), corr, (H, H, H, H),
                         method=net.run_match_model_flat)

    out_r4 = net.apply(variables, corr, (H, H, H, H),
                       method=net.run_match_model_flat)
    _force_6d(monkeypatch)
    assert not ncons_r4_active("red")
    out_6d = net.apply(variables, corr, (H, H, H, H),
                       method=net.run_match_model_flat)
    np.testing.assert_allclose(np.asarray(out_r4), np.asarray(out_6d),
                               rtol=0, atol=1e-5)


def test_r4_param_grads_match_6d(monkeypatch):
    net = MatchNet(temp=3.0, cv_type="red", in_channel=2, block_remat=False)
    corr = _vol(2, seed=3)
    variables = net.init(jax.random.PRNGKey(1), corr, (H, H, H, H),
                         method=net.run_match_model_flat)

    def loss(v):
        out = net.apply(v, corr, (H, H, H, H),
                        method=net.run_match_model_flat)
        return jnp.mean(jnp.square(out))

    g_r4 = jax.grad(loss)(variables)
    _force_6d(monkeypatch)
    g_6d = jax.grad(loss)(variables)
    flat_r4, _ = jax.flatten_util.ravel_pytree(g_r4)
    flat_6d, _ = jax.flatten_util.ravel_pytree(g_6d)
    np.testing.assert_allclose(np.asarray(flat_r4), np.asarray(flat_6d),
                               rtol=1e-4, atol=1e-6)


def test_block_remat_is_numerically_invisible():
    corr = _vol(2, seed=5)

    def grads(block_remat):
        net = MatchNet(temp=3.0, cv_type="red", in_channel=2,
                       block_remat=block_remat)
        variables = net.init(jax.random.PRNGKey(1), corr, (H, H, H, H),
                             method=net.run_match_model_flat)

        def loss(v):
            out = net.apply(v, corr, (H, H, H, H),
                            method=net.run_match_model_flat)
            return jnp.mean(jnp.square(out))

        return variables, jax.grad(loss)(variables)

    v_on, g_on = grads(True)
    v_off, g_off = grads(False)
    # identical param trees (remat must not change init or naming)
    assert jax.tree.structure(v_on) == jax.tree.structure(v_off)
    flat_on, _ = jax.flatten_util.ravel_pytree(g_on)
    flat_off, _ = jax.flatten_util.ravel_pytree(g_off)
    np.testing.assert_allclose(np.asarray(flat_on), np.asarray(flat_off),
                               rtol=1e-5, atol=0)


def test_ncons_bqsc_asymmetric_and_kernel5(monkeypatch):
    """Non-default config coverage: sym off, 5x5 kernels."""
    ncons = NeighConsensus(kernel_sizes=(5, 3), channels=(4, 1),
                           symmetric_mode=False, conv="red",
                           block_remat=False)
    x4 = jax.random.normal(jax.random.PRNGKey(2), (B, Q, S, 2), jnp.float32)
    variables = ncons.init(jax.random.PRNGKey(1), x4, (H, H, H, H),
                           method=ncons.bqsc)
    out_r4 = ncons.apply(variables, x4, (H, H, H, H), method=ncons.bqsc)
    x6 = x4.reshape(B, H, H, H, H, 2)
    out_6d = ncons.apply(variables, x6)
    np.testing.assert_allclose(
        np.asarray(out_r4),
        np.asarray(out_6d.transpose(0, 5, 1, 2, 3, 4).reshape(
            B, out_6d.shape[-1], Q, S)).transpose(0, 2, 3, 1),
        rtol=0, atol=1e-5)


def test_qplane_hwnc_matches_transpose_route(monkeypatch):
    """The transpose-free ("HWNC") query-plane conv is exactly the
    transpose+NHWC+transpose route: fwd and grads, swap_roles both ways,
    on ASYMMETRIC (hq != hs) dims so a reshape mistake cannot cancel."""
    from few_shot_seg_cwt_tpu.models.conv4d import (CenterPivotConv4d,
                                                    qplane_hwnc_active)

    hq, hs = 7, 5
    dims = (hq, hq, hs, hs)
    m = CenterPivotConv4d(out_channels=4, kernel_size=(3,) * 4,
                          padding=(1,) * 4, use_bias=True, stride=(1,) * 4)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, hq * hq, hs * hs, 3))
    variables = m.init(jax.random.PRNGKey(6),
                       jnp.zeros((1, hq, hq, hs, hs, 3)))

    def loss(v, x, swap):
        out = m.apply(v, x, swap, True, dims, True)
        return jnp.sum(jnp.square(out)), out

    for swap in (False, True):
        # default (unset) = transpose route: the HWNC layout measured SLOWER
        # on the real chip (BENCH.md round 5) and is now opt-in via =1
        monkeypatch.delenv("FSS_QPLANE_HWNC", raising=False)
        assert not qplane_hwnc_active()
        (l0, o0), g0 = jax.value_and_grad(loss, argnums=(0, 1),
                                          has_aux=True)(variables, x, swap)
        monkeypatch.setenv("FSS_QPLANE_HWNC", "1")
        assert qplane_hwnc_active()
        (l1, o1), g1 = jax.value_and_grad(loss, argnums=(0, 1),
                                          has_aux=True)(variables, x, swap)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   rtol=0, atol=1e-5)
        f0 = jax.flatten_util.ravel_pytree(g0)[0]
        f1 = jax.flatten_util.ravel_pytree(g1)[0]
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                                   rtol=1e-5, atol=1e-4)
