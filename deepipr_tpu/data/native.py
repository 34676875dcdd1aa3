"""ctypes bindings for the native (C++) augmentation kernel.

Builds native/augment.cpp with g++ on first use (cached as
native/_augment.so); falls back to the NumPy path transparently if no
compiler is available. Python owns the RNG — the kernel receives the crop
offsets and flip decisions, so native and NumPy paths are bit-identical given
the same draws.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "augment.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "_augment.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not (os.path.exists(_SRC) and _build()):
                return None
        lib = ctypes.CDLL(_SO)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.augment_u8_to_f32.argtypes = [
            u8p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, i32p, i32p, u8p, f32p, f32p,
        ]
        lib.normalize_u8_to_f32.argtypes = [
            u8p, f32p, ctypes.c_long, ctypes.c_int, f32p, f32p,
        ]
        _lib = lib
        return _lib


def augment_normalize_native(
    batch_u8: np.ndarray,
    ys: np.ndarray,
    xs: np.ndarray,
    flips: np.ndarray,
    pad: int,
    mean: np.ndarray,
    std: np.ndarray,
) -> Optional[np.ndarray]:
    """Fused pad+crop+flip+normalize; None if the native library is missing."""
    lib = get_lib()
    if lib is None or batch_u8.shape[-1] > 16:
        return None
    b = np.ascontiguousarray(batch_u8)
    n, h, w, c = b.shape
    out = np.empty((n, h, w, c), np.float32)
    lib.augment_u8_to_f32(
        b, out, n, h, w, c, pad,
        np.ascontiguousarray(ys, np.int32),
        np.ascontiguousarray(xs, np.int32),
        np.ascontiguousarray(flips, np.uint8),
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
    )
    return out


def normalize_native(batch_u8: np.ndarray, mean: np.ndarray,
                     std: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or batch_u8.shape[-1] > 16:
        return None
    b = np.ascontiguousarray(batch_u8)
    c = b.shape[-1]
    out = np.empty(b.shape, np.float32)
    lib.normalize_u8_to_f32(
        b, out, b.size // c, c,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
    )
    return out
