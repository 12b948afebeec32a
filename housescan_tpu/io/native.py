"""ctypes bindings for the native host-runtime library.

Builds native/libhousescan_native.so on first use (g++ is part of the
environment); every entry point has a numpy fallback so the framework
works without a toolchain. See native/housescan_native.cpp.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libhousescan_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _LIB_PATH.exists():
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.parse_ascii_floats.restype = ctypes.c_size_t
            lib.parse_ascii_floats.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t,
            ]
            lib.decode_u16_depth.restype = None
            lib.decode_u16_depth.argtypes = [
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t,
                ctypes.c_float,
                ctypes.c_int,
            ]
            lib.transform_points.restype = None
            lib.transform_points.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def parse_ascii_floats(data: bytes, expected: int) -> np.ndarray:
    """Parse whitespace-separated floats ('#' comments skipped).

    Raises ValueError on malformed input or count mismatch.
    """
    lib = _load()
    if lib is None:
        values = np.array(
            [t for t in data.decode("ascii", "replace").split() if not t.startswith("#")],
            dtype=np.float64,
        ).astype(np.float32)
        if values.size != expected:
            raise ValueError(f"expected {expected} floats, got {values.size}")
        return values
    out = np.empty(expected, np.float32)
    n = lib.parse_ascii_floats(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        expected,
    )
    if n == ctypes.c_size_t(-1).value:
        raise ValueError("malformed numeric token in ascii payload")
    if n != expected:
        raise ValueError(f"expected {expected} floats, got {n}")
    return out


def decode_u16_depth(raw: np.ndarray, scale: float = 0.001, n_threads: int = 4) -> np.ndarray:
    """uint16 depth frame(s) -> float32 meters."""
    lib = _load()
    raw = np.ascontiguousarray(raw, np.uint16)
    if lib is None:
        return raw.astype(np.float32) * scale
    out = np.empty(raw.shape, np.float32)
    lib.decode_u16_depth(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        raw.size,
        scale,
        n_threads,
    )
    return out


def transform_points(points: np.ndarray, proj_rowvec: np.ndarray) -> np.ndarray:
    """Host-side (N, 3) @ 4x4 row-vector transform (export fast path)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    m = np.ascontiguousarray(proj_rowvec, np.float32)
    if lib is None:
        return points @ m[:3, :3] + m[3, :3]
    out = np.empty_like(points)
    lib.transform_points(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(points),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
