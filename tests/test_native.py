"""Native episode-transform library: parity with the numpy/cv2 path + speed."""

import subprocess
import time

import numpy as np
import pytest

from few_shot_seg_cwt_tpu.data import native
from few_shot_seg_cwt_tpu.data.transforms import (
    Compose,
    FusedResizeNormalize,
    ResizeKeepAspect,
    ToNormalized,
)

MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]


@pytest.fixture(scope="module", autouse=True)
def built_library():
    if not native.available():
        subprocess.run(["bash", "native/build.sh"], check=True)
        native._TRIED = False  # re-probe
    assert native.available(), "native library failed to build"


def test_fused_matches_numpy_path(rng):
    img = rng.uniform(0, 255, size=(200, 300, 3)).astype(np.float32)
    lab = rng.integers(0, 2, size=(200, 300)).astype(np.uint8)
    lab[0:10] = 255

    ref_img, ref_lab = Compose(
        [ResizeKeepAspect(97), ToNormalized(MEAN, STD)]
    )(img.copy(), lab.copy())
    got_img, got_lab = FusedResizeNormalize(97, MEAN, STD)(img.copy(), lab.copy())

    assert got_img.shape == ref_img.shape
    np.testing.assert_allclose(got_img, ref_img, atol=2e-3)
    np.testing.assert_array_equal(got_lab, ref_lab.astype(np.int32))


def test_fused_with_mean_padding(rng):
    img = rng.uniform(0, 255, size=(120, 80, 3)).astype(np.float32)
    lab = rng.integers(0, 2, size=(120, 80)).astype(np.uint8)
    padding = [v * 255 for v in MEAN]
    ref_img, ref_lab = Compose(
        [ResizeKeepAspect(64, padding=padding), ToNormalized(MEAN, STD)]
    )(img.copy(), lab.copy())
    got_img, got_lab = FusedResizeNormalize(64, MEAN, STD, padding=padding)(
        img.copy(), lab.copy()
    )
    np.testing.assert_allclose(got_img, ref_img, atol=2e-3)
    np.testing.assert_array_equal(got_lab, ref_lab.astype(np.int32))


def test_label_binarization_native(rng):
    lab = rng.integers(0, 21, size=(90, 90)).astype(np.uint8)
    lab[:5] = 255
    out = native.resize_pad_label(lab, 64, 48, 64, target_class=7)
    assert out is not None
    vals = set(np.unique(out))
    assert vals <= {0, 1, 255}
    assert (out[48:, :] == 255).all()  # bottom padding


def test_native_is_faster_than_numpy(rng):
    img = rng.uniform(0, 255, size=(500, 375, 3)).astype(np.float32)
    lab = rng.integers(0, 2, size=(500, 375)).astype(np.uint8)
    fused = FusedResizeNormalize(473, MEAN, STD)
    ref = Compose([ResizeKeepAspect(473), ToNormalized(MEAN, STD)])

    for fn in (fused, ref):  # warm up
        fn(img.copy(), lab.copy())
    t0 = time.perf_counter()
    for _ in range(10):
        fused(img.copy(), lab.copy())
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        ref(img.copy(), lab.copy())
    t_numpy = time.perf_counter() - t0
    # the fused pass should at least not be slower; typically ~2-4x faster
    assert t_native < t_numpy * 1.2, (t_native, t_numpy)
