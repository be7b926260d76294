"""ctypes bindings for the native geometry core.

Compiles ``_native/geometry.cpp`` with the system C++ toolchain on first
use (cached next to the source) and exposes typed wrappers. When the
toolchain or the .so is unavailable — or ``OCRS_TPU_NO_NATIVE=1`` is set —
callers fall back to the numpy reference implementations; both paths are
parity-tested.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SRC = os.path.join(_SRC_DIR, "geometry.cpp")
_LIB_PATH = os.path.join(_SRC_DIR, "libgeometry.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                # fill_polygon's float32 crossing math must round like the
                # numpy twin (two roundings, no fused multiply-add).
                "-ffp-contract=off",
                "-shared",
                "-fPIC",
                "-std=c++17",
                "-o",
                _LIB_PATH,
                _SRC,
            ],
            check=True,
            capture_output=True,
            timeout=240,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("OCRS_TPU_NO_NATIVE") == "1":
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None

        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.cc_label.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p]
        lib.cc_label.restype = ctypes.c_int
        lib.min_area_rect.argtypes = [f64p, ctypes.c_int, f64p]
        lib.min_area_rect.restype = None
        lib.polygon_offset.argtypes = [f64p, ctypes.c_int, ctypes.c_double, f64p]
        lib.polygon_offset.restype = ctypes.c_int
        lib.fill_polygon.argtypes = [f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
        lib.fill_polygon.restype = None
        lib.convex_clip_area.argtypes = [f64p, ctypes.c_int, f64p, ctypes.c_int]
        lib.convex_clip_area.restype = ctypes.c_double
        lib.levenshtein.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int]
        lib.levenshtein.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ------------------------------- typed wrappers -------------------------------


def cc_label(mask: np.ndarray) -> tuple[np.ndarray, int]:
    lib = get_lib()
    assert lib is not None
    m = np.ascontiguousarray(mask > 0, dtype=np.uint8)
    h, w = m.shape
    labels = np.empty((h, w), dtype=np.int32)
    n = lib.cc_label(m, h, w, labels)
    return labels, int(n)


def min_area_rect(pts: np.ndarray) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    p = np.ascontiguousarray(pts, dtype=np.float64).reshape(-1, 2)
    out = np.empty(8, dtype=np.float64)
    lib.min_area_rect(p, len(p), out)
    return out.reshape(4, 2)


def polygon_offset(poly: np.ndarray, dist: float) -> np.ndarray:
    """Offset towards the interior by ``dist`` (negative = outward).
    Returns an empty array when the shrink degenerates."""
    lib = get_lib()
    assert lib is not None
    p = np.ascontiguousarray(poly, dtype=np.float64).reshape(-1, 2)
    out = np.empty((len(p), 2), dtype=np.float64)
    n = lib.polygon_offset(p, len(p), float(dist), out)
    return out[:n]


def fill_polygon(poly: np.ndarray, h: int, w: int, out: np.ndarray) -> None:
    lib = get_lib()
    assert lib is not None
    p = np.ascontiguousarray(poly, dtype=np.float64).reshape(-1, 2)
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    lib.fill_polygon(p, len(p), h, w, out)


def convex_clip_area(a: np.ndarray, b: np.ndarray) -> float:
    lib = get_lib()
    assert lib is not None
    aa = np.ascontiguousarray(a, dtype=np.float64).reshape(-1, 2)
    bb = np.ascontiguousarray(b, dtype=np.float64).reshape(-1, 2)
    return float(lib.convex_clip_area(aa, len(aa), bb, len(bb)))


def levenshtein(a: str, b: str) -> int:
    lib = get_lib()
    assert lib is not None
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    return int(lib.levenshtein(np.ascontiguousarray(aa), len(aa),
                               np.ascontiguousarray(bb), len(bb)))
