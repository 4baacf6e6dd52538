"""ctypes bridge to the native episode-transform library (optional).

Loads native/libfss_native.so (built by native/build.sh) and exposes the
fused resize+pad+normalize kernels used by the hot loader path. Every entry
point degrades to the numpy/cv2 implementation when the library is missing,
so the native build is an optimization, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libfss_native.so")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("FSS_NATIVE_DISABLE") == "1":  # A/B the python tail
        return None
    path = os.environ.get("FSS_NATIVE_LIB", _lib_path())
    if not os.path.exists(path):
        path = _try_build(path)
        if path is None:
            return None
    try:
        lib = ctypes.CDLL(path)
        if lib.fss_native_abi_version() != 1:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64 = ctypes.c_int64
        lib.resize_pad_normalize_f32.argtypes = [
            f32p, i64, i64, f32p, i64, i64, i64, f32p, f32p, f32p,
        ]
        lib.resize_pad_label_i32.argtypes = [
            u8p, i64, i64, i32p, i64, i64, i64, ctypes.c_int32,
        ]
        lib.normalize_f32.argtypes = [f32p, i64, f32p, f32p, f32p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _try_build(lib_path: str) -> Optional[str]:
    """Best-effort one-time build from source (g++ -O3 -shared)."""
    import shutil
    import subprocess

    src = os.path.join(os.path.dirname(lib_path), "fss_native.cpp")
    if not os.path.isfile(src) or shutil.which("g++") is None:
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", lib_path, src],
            check=True, capture_output=True, timeout=120,
        )
        return lib_path if os.path.exists(lib_path) else None
    except Exception:
        return None


def available() -> bool:
    return load_library() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_pad_normalize(
    image: np.ndarray,            # (H, W, 3) float32, 0..255
    size: int,
    nh: int,
    nw: int,
    mean: Sequence[float],
    std: Sequence[float],
    pad_value: Optional[Sequence[float]] = None,
) -> Optional[np.ndarray]:
    """Fused aspect-resize + pad + /255 + normalize; None if lib unavailable."""
    lib = load_library()
    if lib is None:
        return None
    img = np.ascontiguousarray(image, np.float32)
    out = np.empty((size, size, 3), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    pad_a = np.asarray(pad_value, np.float32) if pad_value is not None else None
    lib.resize_pad_normalize_f32(
        _fptr(img), img.shape[0], img.shape[1],
        _fptr(out), size, nh, nw,
        _fptr(mean_a), _fptr(std_a),
        _fptr(pad_a) if pad_a is not None else ctypes.cast(None, ctypes.POINTER(ctypes.c_float)),
    )
    return out


def resize_pad_label(
    label: np.ndarray,            # (H, W) uint8
    size: int,
    nh: int,
    nw: int,
    target_class: int = -1,
) -> Optional[np.ndarray]:
    """Fused nearest-resize + 255-pad (+ optional binarization)."""
    lib = load_library()
    if lib is None:
        return None
    lab = np.ascontiguousarray(label, np.uint8)
    out = np.empty((size, size), np.int32)
    lib.resize_pad_label_i32(
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lab.shape[0], lab.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        size, nh, nw, target_class,
    )
    return out
