"""Parity: keypoint-transfer geometry + learned positional encoding vs torch ref."""

import numpy as np
import pytest

from tests import ref_compat

import jax
import jax.numpy as jnp

from few_shot_seg_cwt_tpu.ops.geometry import (
    apply_gaussian_kernel,
    attentive_indexing,
    normalize_kps,
    transfer_kps,
    unnormalize_kps,
)

needs_ref = pytest.mark.skipif(not ref_compat.HAVE_REF, reason="reference absent")

# spatial_side 20: grid spacing 2/19 keeps every keypoint within the 0.1
# attentive-indexing radius of some cell (the reference 0/0-NaNs otherwise —
# it assumes the 50+ sides of its real protocol); still small on the 1-CPU box
IMG = 160
SIDE = IMG // 8


@pytest.fixture(scope="module")
def ref_geometry():
    from src.model.base.geometry import Geometry

    Geometry.initialize(IMG)
    return Geometry


@needs_ref
def test_normalize_roundtrip(ref_geometry, rng):
    import torch

    kps = rng.uniform(0, IMG, size=(2, 2, 6)).astype(np.float32)
    kps[0, :, 4:] = -2.0  # padded entries
    ref = ref_geometry.normalize_kps(torch.from_numpy(kps)).numpy()
    got = np.asarray(normalize_kps(jnp.asarray(kps), IMG))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    back = np.asarray(unnormalize_kps(jnp.asarray(got), IMG))
    ref_back = ref_geometry.unnormalize_kps(torch.from_numpy(ref)).numpy()
    np.testing.assert_allclose(back, ref_back, atol=1e-5)


@needs_ref
def test_attentive_indexing(ref_geometry, rng):
    import torch

    kps = rng.uniform(-0.9, 0.9, size=(5, 2)).astype(np.float32)
    ref = ref_geometry.attentive_indexing(torch.from_numpy(kps), thres=0.1).numpy()
    got = np.asarray(attentive_indexing(jnp.asarray(kps), SIDE, thres=0.1))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@needs_ref
def test_gaussian_kernel(ref_geometry, rng):
    import torch

    corr = rng.standard_normal((2, SIDE * SIDE, SIDE * SIDE)).astype(np.float32)
    ref = ref_geometry.apply_gaussian_kernel(torch.from_numpy(corr), sigma=17).numpy()
    got = np.asarray(apply_gaussian_kernel(jnp.asarray(corr), SIDE, sigma=17.0))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@needs_ref
def test_transfer_kps(ref_geometry, rng):
    import torch

    b, max_pts = 2, 5
    conf = rng.standard_normal((b, SIDE * SIDE, SIDE * SIDE)).astype(np.float32)
    kps = rng.uniform(0, IMG, size=(b, 2, max_pts)).astype(np.float32)
    n_pts = np.array([5, 3])
    # reference pads its own output with -2 beyond n_pts
    ref = ref_geometry.transfer_kps(
        torch.from_numpy(conf), torch.from_numpy(kps),
        torch.from_numpy(n_pts), normalized=False,
    ).numpy()
    got = np.asarray(transfer_kps(
        jnp.asarray(conf), jnp.asarray(kps), jnp.asarray(n_pts), IMG,
        normalized=False,
    ))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@needs_ref
def test_learned_positional_encoding_parity(rng):
    import torch

    from src.model.positional_encoding import LearnedPositionalEncoding as RefPE

    from few_shot_seg_cwt_tpu.models.deform import LearnedPositionalEncoding

    num_feats, h, w = 8, 6, 7
    ref_pe = RefPE(num_feats, row_num_embed=16, col_num_embed=16)
    mod = LearnedPositionalEncoding(num_feats=num_feats,
                                    row_num_embed=16, col_num_embed=16)
    mask = jnp.zeros((2, h, w), jnp.int32)
    variables = mod.init(jax.random.PRNGKey(0), mask)
    variables = jax.tree.map(np.asarray, variables)
    variables["params"]["row_embed"] = ref_pe.row_embed.weight.detach().numpy()
    variables["params"]["col_embed"] = ref_pe.col_embed.weight.detach().numpy()

    ref = ref_pe(torch.zeros(2, h, w)).detach().numpy()       # (B, 2F, h, w)
    got = np.asarray(mod.apply(variables, mask))              # (B, h, w, 2F)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-6)
