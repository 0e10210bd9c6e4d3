"""ctypes bindings for the native C++ harness runtime (libfdtd_harness.so).

Auto-builds with `make` on first import when a compiler is available; all
callers degrade gracefully to NumPy implementations when the library is
missing (import of this module then fails, which consumers catch).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfdtd_harness.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


if not os.path.exists(_LIB_PATH) and not _build():
    raise ImportError("libfdtd_harness.so not available")

_lib = ctypes.CDLL(_LIB_PATH)

_lib.tf_error_scan_f64.argtypes = [
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double),
    ctypes.c_int64,
    ctypes.POINTER(ctypes.c_double),
]
_lib.tf_field_scan_f32.argtypes = [
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64,
    ctypes.POINTER(ctypes.c_double),
]
_lib.tf_ricker.argtypes = [
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.c_float,
    ctypes.c_float,
]
_lib.tf_stats.argtypes = [
    ctypes.POINTER(ctypes.c_double),
    ctypes.c_int64,
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double),
]
_lib.tf_csv_append.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
_lib.tf_csv_append.restype = ctypes.c_int


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def error_scan(test: np.ndarray, ref: np.ndarray):
    """(max_abs, max_rel, rel_l2, nan_count, inf_count)."""
    t = np.ascontiguousarray(test, np.float64).ravel()
    r = np.ascontiguousarray(ref, np.float64).ravel()
    assert t.size == r.size
    out = np.zeros(5, np.float64)
    _lib.tf_error_scan_f64(_dptr(t), _dptr(r), t.size, _dptr(out))
    return float(out[0]), float(out[1]), float(out[2]), int(out[3]), int(out[4])


def field_scan(u: np.ndarray):
    """(max_abs, nan_count, inf_count) over a float32 field."""
    a = np.ascontiguousarray(u, np.float32).ravel()
    out = np.zeros(3, np.float64)
    _lib.tf_field_scan_f32(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.size, _dptr(out)
    )
    return float(out[0]), int(out[1]), int(out[2])


def ricker(nt: int, nsrc: int, dt: float, f0: float = 10.0) -> np.ndarray:
    out = np.empty((nt, max(1, nsrc)), np.float32)
    _lib.tf_ricker(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nt,
        max(1, nsrc),
        ctypes.c_float(dt),
        ctypes.c_float(f0),
    )
    return out


def stats(values):
    v = np.ascontiguousarray(values, np.float64).ravel()
    mean = ctypes.c_double()
    std = ctypes.c_double()
    _lib.tf_stats(_dptr(v), v.size, ctypes.byref(mean), ctypes.byref(std))
    return mean.value, std.value


def csv_append(path: str, fields) -> None:
    from ..utils.csvio import HEADER

    out = []
    for v in fields:
        if isinstance(v, str):
            out.append(v)
        elif isinstance(v, (int, np.integer)):
            out.append(str(int(v)))
        else:
            out.append(f"{float(v):g}")
    rc = _lib.tf_csv_append(
        path.encode(), HEADER.encode(), ",".join(out).encode()
    )
    if rc != 0:
        raise IOError(f"csv append failed for {path}")
