"""ctypes binding for the native map-preprocessing library (native/mapops.c).

The reference's map pipeline runs through native third-party code (PIL's C
decoder, skimage's Cython components; map.py:61, 113-114).  This module binds
the framework's own C implementation of the post-decode stage — binarization
+ 8-connectivity small-hole removal — building it on first use with the
system compiler; :mod:`multi_purpose_mpc_tpu.utils.maps` falls back to the
scipy.ndimage implementation when neither a prebuilt ``libmapops.so`` nor a
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmapops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "mapops.c")
    if not os.path.exists(src):
        return False
    for cc in ("cc", "gcc", "g++"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.preprocess_map_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.preprocess_map_u8.restype = None
    lib.remove_small_holes_i8.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.remove_small_holes_i8.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def preprocess_map(img: np.ndarray, threshold: int, area_threshold: int) -> np.ndarray:
    """Raw channel bytes -> clean binary grid via the C pipeline."""
    lib = load()
    assert lib is not None, "native mapops unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    out = np.empty((h, w), np.int8)
    lib.preprocess_map_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        h, w, threshold, area_threshold)
    return out


def remove_small_holes_native(binary: np.ndarray, area_threshold: int) -> np.ndarray:
    lib = load()
    assert lib is not None, "native mapops unavailable"
    out = np.ascontiguousarray(binary, np.int8).copy()
    h, w = out.shape
    lib.remove_small_holes_i8(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), h, w, area_threshold)
    return out
