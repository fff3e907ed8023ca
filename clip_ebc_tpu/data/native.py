"""ctypes bindings for the native host-pipeline kernels (native/ebc_host.cpp).

Builds on demand (``ensure_built()``) and degrades gracefully: every entry
point has a numpy fallback with identical semantics, so the framework runs
without a C++ toolchain. ``HAVE_NATIVE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import IMAGENET_MEAN, IMAGENET_STD
from . import density as _np_density

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libebc_host.so")

_lib: Optional[ctypes.CDLL] = None
HAVE_NATIVE = False
_HAVE_UPSCALE = False

_MEAN = np.asarray(IMAGENET_MEAN, np.float32)
_STD = np.asarray(IMAGENET_STD, np.float32)

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def ensure_built(force: bool = False) -> bool:
    """Build the shared library if needed; returns availability."""
    global _lib, HAVE_NATIVE
    if _lib is not None and not force:
        return True
    if not os.path.exists(_LIB_PATH) or force:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return False
    lib.normalize_u8.argtypes = [_u8p, _f32p, ctypes.c_int64, _f32p, _f32p]
    lib.normalize_f32.argtypes = [_f32p, _f32p, ctypes.c_int64, _f32p, _f32p]
    lib.rasterize_blocks.argtypes = [
        _f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p, _u8p,
    ]
    lib.block_sum.argtypes = [_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p]
    lib.pad_points.argtypes = [_f32p, _i64p, ctypes.c_int64, ctypes.c_int64, _f32p, _u8p]
    lib.pepper_salt.argtypes = [_f32p, _f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float]
    global _HAVE_UPSCALE
    try:
        # added in ebc_host_version 2: a stale locally-built .so may lack
        # it — degrade that ONE kernel to numpy instead of failing the
        # whole package import
        lib.bicubic_upscale_window.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _i32p, _f32p, _i32p, _f32p,
            ctypes.c_int, ctypes.c_int, _f32p,
        ]
        _HAVE_UPSCALE = True
    except AttributeError:
        _HAVE_UPSCALE = False
    lib.ebc_host_version.restype = ctypes.c_int
    _lib = lib
    HAVE_NATIVE = True
    return True


def bicubic_upscale_window(
    image: np.ndarray,
    idx_y: np.ndarray, wy: np.ndarray,
    idx_x: np.ndarray, wx: np.ndarray,
):
    """Fused 4x4-stencil bicubic upscale of a window (taps from
    transforms._torch_cubic_taps, pre-sliced to the window). Returns None
    when the native library is absent — the caller keeps its numpy path.
    Single fused float32 accumulation per output pixel (vs the numpy
    two-pass separable path): within ~1e-6 relative, closer to torch's
    own one-pass upsample_bicubic2d."""
    if _lib is None or not _HAVE_UPSCALE:
        return None
    src = np.ascontiguousarray(image, np.float32)
    ih, iw, c = src.shape
    ch, cw = idx_y.shape[0], idx_x.shape[0]
    out = np.empty((ch, cw, c), np.float32)
    _lib.bicubic_upscale_window(
        src, ih, iw, c,
        np.ascontiguousarray(idx_y, np.int32), np.ascontiguousarray(wy, np.float32),
        np.ascontiguousarray(idx_x, np.int32), np.ascontiguousarray(wx, np.float32),
        ch, cw, out,
    )
    return out


def normalize_image(image: np.ndarray) -> np.ndarray:
    """float32 [0,1] HWC -> ImageNet-normalized float32 HWC."""
    if _lib is not None:
        src = np.ascontiguousarray(image, np.float32)
        dst = np.empty_like(src)
        _lib.normalize_f32(src, dst, src.shape[0] * src.shape[1], _MEAN, _STD)
        return dst
    return ((image - _MEAN) / _STD).astype(np.float32)


def rasterize_blocks(points: np.ndarray, h: int, w: int, reduction: int) -> np.ndarray:
    """Dot-map rasterization fused with block-sum: (N, 2) -> (h/r, w/r)."""
    if h % reduction or w % reduction:
        raise ValueError(f"{h}x{w} not divisible by reduction {reduction}")
    if _lib is not None:
        pts = np.ascontiguousarray(points, np.float32).reshape(-1, 2)
        out = np.empty((h // reduction, w // reduction), np.float32)
        scratch = np.empty(h * w, np.uint8)
        _lib.rasterize_blocks(pts, len(pts), h, w, reduction, out, scratch)
        return out
    full = _np_density.rasterize_points(points, h, w)
    return _np_density.block_sum(full[None], reduction)[0]


def block_sum(density: np.ndarray, reduction: int) -> np.ndarray:
    if _lib is not None and density.ndim == 2:
        d = np.ascontiguousarray(density, np.float32)
        h, w = d.shape
        out = np.empty((h // reduction, w // reduction), np.float32)
        _lib.block_sum(d, h, w, reduction, out)
        return out
    return _np_density.block_sum(density, reduction)


def pad_points(point_lists: Sequence[np.ndarray], max_points: int) -> Tuple[np.ndarray, np.ndarray]:
    if _lib is not None:
        counts = np.asarray([len(p) for p in point_lists], np.int64)
        cat = (
            np.concatenate([np.asarray(p, np.float32).reshape(-1, 2) for p in point_lists])
            if counts.sum()
            else np.zeros((0, 2), np.float32)
        )
        cat = np.ascontiguousarray(cat, np.float32)
        b = len(point_lists)
        out = np.empty((b, max_points, 2), np.float32)
        mask = np.empty((b, max_points), np.uint8)
        _lib.pad_points(cat, counts, b, max_points, out, mask)
        return out, mask.astype(bool)
    from .loader import pad_points as np_pad

    return np_pad(point_lists, max_points)


def pepper_salt(image: np.ndarray, noise: np.ndarray, saltiness: float, spiciness: float) -> np.ndarray:
    if _lib is not None:
        img = np.ascontiguousarray(image, np.float32)
        _lib.pepper_salt(img, np.ascontiguousarray(noise, np.float32), img.size, saltiness, spiciness)
        return img
    image = np.where(noise < saltiness, 1.0, image)
    return np.where(noise > 1.0 - spiciness, 0.0, image).astype(np.float32)


# Try to bind an existing build at import (never compile implicitly).
if os.path.exists(_LIB_PATH):
    ensure_built()
