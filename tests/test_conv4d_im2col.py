"""The channel-folded im2col conv4d forward routes are exactly the
shifted-conv3d loop, forward and backward (q/qp: dx through the custom VJP
takes the active route, dk is route-independent; gemm: the matmul form
bypasses the custom VJP entirely and autodiff supplies both grads).

Reference semantics under test: the true stride-1 4D convolution of
src/model/base/chm.py:12-37 (CHM4d fast4d) at CHM-like channel counts.
"""

import jax
import jax.flatten_util  # noqa: F401 — jax.flatten_util is lazy
import jax.numpy as jnp
import numpy as np
import pytest

from few_shot_seg_cwt_tpu.models.conv4d import (conv4d, conv4d_im2col_mode)


def _loss(x, k):
    out = conv4d(x, k)
    return jnp.sum(jnp.square(out)), out


@pytest.mark.parametrize("mode", ["q", "qp", "gemm"])
@pytest.mark.parametrize("shape,ksz", [
    ((1, 6, 5, 4, 7, 1), (5, 5, 5, 5)),   # chm4d-like: 1 channel, asym dims
    ((2, 5, 5, 4, 4, 3), (3, 3, 3, 3)),   # multi-channel, batch 2
    ((1, 4, 4, 4, 4, 9), (5, 5, 3, 3)),   # chm6d-like channels, mixed k
])
def test_im2col_matches_loop(monkeypatch, mode, shape, ksz):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.normal(0, 1.0, shape), jnp.float32)
    k = jnp.asarray(r.normal(0, 0.2, ksz + (shape[-1], 2)), jnp.float32)

    monkeypatch.setenv("FSS_CONV4D_IM2COL", "0")
    assert conv4d_im2col_mode() == "loop"
    (l0, o0), g0 = jax.value_and_grad(_loss, argnums=(0, 1),
                                      has_aux=True)(x, k)

    monkeypatch.setenv("FSS_CONV4D_IM2COL", mode)
    assert conv4d_im2col_mode() in ("q", "qp", "gemm")
    (l1, o1), g1 = jax.value_and_grad(_loss, argnums=(0, 1),
                                      has_aux=True)(x, k)

    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=0, atol=2e-5)
    f0 = jax.flatten_util.ravel_pytree(g0)[0]
    f1 = jax.flatten_util.ravel_pytree(g1)[0]
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               rtol=2e-4, atol=2e-4)


def test_mode_parse(monkeypatch):
    monkeypatch.delenv("FSS_CONV4D_IM2COL", raising=False)
    assert conv4d_im2col_mode() == "q"    # round-5 default (BENCH.md A/B)
    monkeypatch.setenv("FSS_CONV4D_IM2COL", "1")
    assert conv4d_im2col_mode() == "qp"
    monkeypatch.setenv("FSS_CONV4D_IM2COL", "0")
    assert conv4d_im2col_mode() == "loop"
    monkeypatch.setenv("FSS_CONV4D_IM2COL", "loop")
    assert conv4d_im2col_mode() == "loop"
    monkeypatch.setenv("FSS_CONV4D_IM2COL", "bogus")
    with pytest.raises(ValueError):
        conv4d_im2col_mode()
