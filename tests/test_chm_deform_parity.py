"""Parity of CHM (Hough matching) and deformable attention vs the reference."""

import numpy as np
import pytest

from tests.ref_compat import HAVE_REF

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference tree not mounted")

import jax
import jax.numpy as jnp

from few_shot_seg_cwt_tpu.models.chm import (
    CHM4d,
    CHM6d,
    CHMLearner,
    interpolate4d,
    kernel_groups,
)
from few_shot_seg_cwt_tpu.models.deform import (
    DeformAtt,
    MSDeformAttn,
    grid_sample_bilinear,
    sine_positional_encoding,
)


def test_kernel_groups_match_reference():
    from src.model.base.chm_kernel import KernelGenerator

    for ksz, ktype in ((3, "psi"), (5, "psi"), (5, "iso")):
        ref = KernelGenerator(ksz, ktype).generate()
        got = kernel_groups(ksz, ktype)
        assert len(ref) == len(got)
        for ref_idx, got_idx in zip(ref.values(), got):
            assert list(ref_idx) == list(got_idx)


def test_interpolate4d_matches_reference(rng):
    import torch
    from src.model.base.geometry import Geometry

    x = rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32)
    ref = Geometry.interpolate4d(torch.from_numpy(x), [8, 8]).numpy()
    got = np.asarray(interpolate4d(jnp.asarray(x), 8))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_chm4d_matches_reference(rng):
    import torch
    from src.model.base.chm import CHM4d as RefCHM4d

    torch.manual_seed(11)
    ref_mod = RefCHM4d(1, 1, 5, "psi", bias=True)
    ref_mod.eval()
    x = rng.standard_normal((1, 1, 6, 6, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(x)).numpy()

    mod = CHM4d(ksz=5, ktype="psi")
    params = {
        "weight": ref_mod.weight.detach().numpy(),
        "bias": ref_mod.bias.detach().numpy().reshape(()),
    }
    got = np.asarray(
        mod.apply({"params": params}, jnp.asarray(x[0, 0][None, ..., None]))
    )[..., 0]
    np.testing.assert_allclose(got[None], ref[:, 0][None], rtol=1e-3, atol=1e-5)


def test_chm6d_matches_reference(rng):
    import torch
    from src.model.base.chm import CHM6d as RefCHM6d

    torch.manual_seed(12)
    ref_mod = RefCHM6d(1, 1, 3, 3, "psi")
    ref_mod.eval()
    x = rng.standard_normal((1, 1, 3, 3, 5, 5, 5, 5)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(x)).numpy()

    mod = CHM6d(ksz6d=3, ksz4d=3, ktype="psi")
    params = {
        f"param_{i}": p.detach().numpy() for i, p in enumerate(ref_mod.param)
    }
    params["bias"] = ref_mod.bias.detach().numpy().reshape(())
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x[:, 0])))
    np.testing.assert_allclose(got, ref[:, 0], rtol=1e-3, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    v = rng.standard_normal((2, 3, 7, 9)).astype(np.float32)
    g = rng.uniform(-1.3, 1.3, size=(2, 5, 4, 2)).astype(np.float32)
    ref = F.grid_sample(torch.from_numpy(v), torch.from_numpy(g), mode="bilinear",
                        padding_mode="zeros", align_corners=False).numpy()
    got = np.asarray(grid_sample_bilinear(jnp.asarray(v.transpose(0, 2, 3, 1)),
                                          jnp.asarray(g)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)


def test_sine_positional_encoding_matches_reference(rng):
    import torch
    from src.model.positional_encoding import SinePositionalEncoding

    mask = np.zeros((2, 6, 7), np.int64)
    mask[1, :2] = 1
    ref_mod = SinePositionalEncoding(8, normalize=True)
    ref = ref_mod(torch.from_numpy(mask).bool()).numpy()
    got = np.asarray(sine_positional_encoding(jnp.asarray(mask), 8, normalize=True))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4)


def test_deform_att_matches_reference(rng):
    import torch
    from src.model.detr import DeformAtt as RefDeformAtt

    torch.manual_seed(13)
    dim = 32
    ref_mod = RefDeformAtt(embed_dims=dim, n_heads=4, n_points=3, n_levels=1)
    ref_mod.eval()

    fq_fea = rng.standard_normal((2, dim, 6, 6)).astype(np.float32)
    f_q = rng.standard_normal((2, dim, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(fq_fea), torch.from_numpy(f_q)).numpy()

    mod = DeformAtt(embed_dims=dim, n_heads=4, n_points=3, n_levels=1)
    lin = lambda m: {"kernel": m.weight.detach().numpy().T,
                     "bias": m.bias.detach().numpy()}
    params = {
        "level_embed": ref_mod.level_embed.detach().numpy(),
        "self_trans": {
            "sampling_offsets": lin(ref_mod.self_trans.sampling_offsets),
            "attention_weights": lin(ref_mod.self_trans.attention_weights),
            "value_proj": lin(ref_mod.self_trans.value_proj),
            "output_proj": lin(ref_mod.self_trans.output_proj),
        },
    }
    got = np.asarray(
        mod.apply({"params": params},
                  jnp.asarray(fq_fea.transpose(0, 2, 3, 1)),
                  jnp.asarray(f_q.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4)


def test_chm_learner_runs(rng):
    """Structural smoke: full CHMLearner forward at a tiny side."""
    mod = CHMLearner(ktype="psi", feat_dim=32, temp=20.0)
    src = jnp.asarray(rng.standard_normal((1, 8, 8, 32)).astype(np.float32))
    trg = jnp.asarray(rng.standard_normal((1, 8, 8, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 16, 16, 24)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), src, trg, v)
    out = mod.apply(variables, src, trg, v)
    assert out.shape == (1, 16, 16, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_chm6d_reference_kernel_size_matches(rng):
    """The CHMLearner wiring uses ksz4d=5 (reference ksz_translation)."""
    import torch
    from src.model.base.chm import CHM6d as RefCHM6d

    torch.manual_seed(14)
    ref_mod = RefCHM6d(1, 1, 3, 5, "psi")
    ref_mod.eval()
    x = rng.standard_normal((1, 1, 3, 3, 6, 6, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(x)).numpy()

    mod = CHM6d(ksz6d=3, ksz4d=5, ktype="psi")
    params = {f"param_{i}": p.detach().numpy() for i, p in enumerate(ref_mod.param)}
    params["bias"] = ref_mod.bias.detach().numpy().reshape(())
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x[:, 0])))
    np.testing.assert_allclose(got, ref[:, 0], rtol=1e-3, atol=1e-5)
