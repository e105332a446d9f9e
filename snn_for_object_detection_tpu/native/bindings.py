"""ctypes bindings for the C++ event kernels, with lazy one-shot build.

The shared library is compiled from ``event_ops.cc`` on first import
(g++ is baked into the image; pybind11 is not, hence ctypes). The build
artifact is cached next to the source; failures degrade silently to the
numpy implementations in :mod:`..data`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "event_ops.cc")
_LIB = os.path.join(_HERE, "libevent_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(
        _SRC
    ):
        return _LIB
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return _LIB
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.decode_events.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.decode_events.restype = None
        for fname in ("rasterize_records", "rasterize_records_u8"):
            fn = getattr(lib, fname)
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
            ]
            fn.restype = ctypes.c_int64
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def decode_events_native(records: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
    """Decode [N, 2] uint32 records; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    records = np.ascontiguousarray(records, dtype=np.uint32)
    n = records.shape[0]
    t = np.empty(n, np.uint32)
    x = np.empty(n, np.uint16)
    y = np.empty(n, np.uint16)
    p = np.empty(n, np.uint8)
    lib.decode_events(
        records.ctypes.data, n,
        t.ctypes.data, x.ctypes.data, y.ctypes.data, p.ctypes.data,
    )
    return {"t": t, "x": x, "y": y, "p": p}


def rasterize_records_native(
    records: np.ndarray,
    t_min_us: int,
    step_us: int,
    num_steps: int,
    height: int,
    width: int,
    clip_x: bool = False,
    out: Optional[np.ndarray] = None,
    dtype=np.float32,
) -> Optional[Tuple[np.ndarray, int]]:
    """Fused decode+scatter. Returns (frames [T,H,W,2], n_in_window)
    or None if the native library is unavailable. ``dtype`` may be
    float32 or uint8 (4x smaller buffer + transfer)."""
    lib = _load()
    if lib is None:
        return None
    dtype = np.dtype(dtype)
    fn = (
        lib.rasterize_records
        if dtype == np.float32
        else lib.rasterize_records_u8
    )
    if dtype not in (np.float32, np.uint8):
        raise ValueError(f"unsupported frame dtype {dtype}")
    records = np.ascontiguousarray(records, dtype=np.uint32)
    if out is None:
        out = np.zeros((num_steps, height, width, 2), dtype)
    else:
        assert out.dtype == dtype
        out.fill(0)
    n = fn(
        records.ctypes.data, records.shape[0],
        int(t_min_us), int(step_us),
        int(num_steps), int(height), int(width), int(bool(clip_x)),
        out.ctypes.data,
    )
    return out, int(n)
