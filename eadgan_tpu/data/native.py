"""ctypes binding for the native batch-assembly library.

Builds ``native/batcher.cpp`` with g++ on first use (cached in
``native/build/``); every entry point has a numpy fallback so the
framework runs even without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = [
    "native_available",
    "gather_normalize",
    "gather_normalize_flip",
    "gather_colorize",
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "batcher.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libeadgan_batcher.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            stale = (
                os.path.exists(_SO)
                and os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            )
            if (not os.path.exists(_SO) or stale) and os.path.exists(_SRC):
                # single source of truth for build flags: the Makefile
                subprocess.run(
                    ["make", "-C", os.path.dirname(_SRC)],
                    check=True,
                    capture_output=True,
                )
            if os.path.exists(_SO):
                lib = ctypes.CDLL(_SO)
                lib.eadgan_gather_norm_u8.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_float, ctypes.c_float,
                    ctypes.c_void_p, ctypes.c_int,
                ]
                lib.eadgan_gather_norm_flip_u8.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_float, ctypes.c_float, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_int,
                ]
                lib.eadgan_gather_colorize_u8.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_float,
                    ctypes.c_float, ctypes.c_void_p, ctypes.c_int,
                ]
                _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def gather_normalize(
    src_u8: np.ndarray,
    idx: np.ndarray,
    scale: float = 1.0,
    shift: float = 0.0,
    n_threads: int = 8,
) -> np.ndarray:
    """dst[r] = src[idx[r]] * scale + shift as float32, appending a
    trailing channel axis for 2-D rows: (N, H, W) -> (B, H, W, 1)."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    row_shape = src_u8.shape[1:]
    row_elems = int(np.prod(row_shape))
    out_shape = (len(idx),) + row_shape + ((1,) if len(row_shape) == 2 else ())
    if lib is None or src_u8.dtype != np.uint8 or not src_u8.flags.c_contiguous:
        out = src_u8[idx].astype(np.float32) * scale + shift
        return out.reshape(out_shape)
    dst = np.empty((len(idx), row_elems), np.float32)
    lib.eadgan_gather_norm_u8(
        src_u8.ctypes.data, idx.ctypes.data, len(idx), row_elems,
        ctypes.c_float(scale), ctypes.c_float(shift), dst.ctypes.data,
        n_threads,
    )
    return dst.reshape(out_shape)


def gather_normalize_flip(
    src_u8: np.ndarray,
    idx: np.ndarray,
    flip: np.ndarray,
    scale: float = 1.0,
    shift: float = 0.0,
    n_threads: int = 8,
) -> np.ndarray:
    """``gather_normalize`` with a fused per-row horizontal mirror.

    ``flip`` is a (B,) bool/uint8 mask; rows where it is truthy are
    mirrored along the width axis — torchvision ``RandomHorizontalFlip``
    re-drawn per batch like the reference transform pipeline
    (celebA/EAD-GAN_celebA.py:199), instead of one static draw per image
    at load time.  ``src_u8`` is (N, H, W) or (N, H, W, C); 2-D rows gain
    a trailing channel axis like ``gather_normalize``.
    """
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    flip = np.ascontiguousarray(flip, np.uint8)
    row_shape = src_u8.shape[1:]
    h, w = row_shape[0], row_shape[1]
    c = row_shape[2] if len(row_shape) == 3 else 1
    out_shape = (len(idx),) + row_shape + ((1,) if len(row_shape) == 2 else ())
    if lib is None or src_u8.dtype != np.uint8 or not src_u8.flags.c_contiguous:
        out = src_u8[idx].astype(np.float32) * scale + shift
        mask = flip.astype(bool)
        out[mask] = out[mask, :, ::-1]
        return out.reshape(out_shape)
    dst = np.empty((len(idx), h * w * c), np.float32)
    lib.eadgan_gather_norm_flip_u8(
        src_u8.ctypes.data, idx.ctypes.data, len(idx), h, w, c,
        ctypes.c_float(scale), ctypes.c_float(shift), flip.ctypes.data,
        dst.ctypes.data, n_threads,
    )
    return dst.reshape(out_shape)


def gather_colorize(
    src_u8: np.ndarray,
    idx: np.ndarray,
    gains: np.ndarray,
    scale: float = 1.0,
    shift: float = 0.0,
    n_threads: int = 8,
) -> np.ndarray:
    """Gray rows -> (B, H, W, 3) float32 with per-image RGB gains."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    gains = np.ascontiguousarray(gains, np.float32)
    h, w = src_u8.shape[1:]
    if lib is None or src_u8.dtype != np.uint8 or not src_u8.flags.c_contiguous:
        base = src_u8[idx].astype(np.float32) * scale + shift
        return base[..., None] * gains[:, None, None, :]
    dst = np.empty((len(idx), h, w, 3), np.float32)
    lib.eadgan_gather_colorize_u8(
        src_u8.ctypes.data, idx.ctypes.data, len(idx), h * w,
        gains.ctypes.data, ctypes.c_float(scale), ctypes.c_float(shift),
        dst.ctypes.data, n_threads,
    )
    return dst
