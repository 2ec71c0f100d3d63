"""ctypes bindings for the native data-IO core (native/dataio.cpp).

Falls back to the numpy implementations transparently when the shared
library hasn't been built; ``build()`` compiles it on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libprv2io.so",
)


def build() -> bool:
    src = os.path.join(os.path.dirname(_LIB_PATH), "dataio.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        if not build():
            _LIB = False
            return _LIB
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.load_raw_bgr_as_rgb_f32.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def available() -> bool:
    return bool(_lib())


def load_raw_bgr_as_rgb_f32(path: str, h: int = 2160, w: int = 3840) -> np.ndarray | None:
    lib = _lib()
    if not lib:
        return None
    out = np.empty((h, w, 3), np.float32)
    rc = lib.load_raw_bgr_as_rgb_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(h), ctypes.c_int(w),
    )
    return out if rc == 0 else None


def resize_bilinear_ac(img: np.ndarray, size: tuple[int, int]) -> np.ndarray | None:
    lib = _lib()
    if not lib:
        return None
    img = np.ascontiguousarray(img, np.float32)
    ih, iw, c = img.shape
    oh, ow = size
    out = np.empty((oh, ow, c), np.float32)
    lib.resize_bilinear_ac(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(ih), ctypes.c_int(iw), ctypes.c_int(c),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(oh), ctypes.c_int(ow),
    )
    return out


def crop_resize_bilinear_ac(
    img: np.ndarray, y: int, x: int, ch: int, cw: int, size: tuple[int, int]
) -> np.ndarray | None:
    lib = _lib()
    if not lib:
        return None
    img = np.ascontiguousarray(img, np.float32)
    ih, iw, c = img.shape
    oh, ow = size
    out = np.empty((oh, ow, c), np.float32)
    lib.crop_resize_bilinear_ac(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(ih), ctypes.c_int(iw), ctypes.c_int(c),
        ctypes.c_int(y), ctypes.c_int(x), ctypes.c_int(ch), ctypes.c_int(cw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(oh), ctypes.c_int(ow),
    )
    return out
