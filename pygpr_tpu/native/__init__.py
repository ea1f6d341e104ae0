"""ctypes loader for the native data-layer library.

Compiles ``data_layer.cpp`` on first use (g++ is in the image; build
output is cached next to the source) and exposes typed wrappers.  Every
entry point has a NumPy fallback, so the package works without a
toolchain — the native path is ~100-1000× faster on the sequential
hard-core scan at reference-scale ``max_count`` (5000+).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "data_layer.cpp")
_LIB = os.path.join(_HERE, "libpygpr_data.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.hard_core_accept.restype = ctypes.c_int
        lib.hard_core_accept.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.nearest_center.restype = None
        lib.nearest_center.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sq_dist_matrix.restype = None
        lib.sq_dist_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ski_stats_accum.restype = ctypes.c_int
        lib.ski_stats_accum.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.gather_rows_f32.restype = None
        lib.gather_rows_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def hard_core_accept(
    cand: np.ndarray, min_dist: float, tol: float = 1e-5
) -> Tuple[np.ndarray, int]:
    """Sequential hard-core acceptance.  Returns ``(mask [m] bool, k)``.

    Native when available; NumPy fallback otherwise.  Reference
    semantics: accept iff distance to all accepted > min_dist + tol
    (``PyGPR/sampler.py:41``).
    """
    cand = np.ascontiguousarray(cand, dtype=np.float64)
    m, dim = cand.shape
    lib = get_lib()
    if lib is not None:
        mask = np.zeros((m,), dtype=np.uint8)
        lib.hard_core_accept(
            _dptr(cand), m, dim, float(min_dist), float(tol),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        mask_b = mask.astype(bool)
        return mask_b, int(mask_b.sum())
    # fallback
    mask_b = np.zeros((m,), bool)
    acc = np.empty_like(cand)
    k = 0
    for i in range(m):
        c = cand[i]
        if k == 0:
            acc[0] = c
            mask_b[0] = True
            k = 1
            continue
        d = np.sqrt(np.sum((acc[:k] - c) ** 2, axis=-1))
        if np.all(d - min_dist > tol):
            acc[k] = c
            mask_b[i] = True
            k += 1
    return mask_b, k


def nearest_center(x: np.ndarray, xc: np.ndarray) -> np.ndarray:
    """Nearest-center index per point, ``[n] int32``."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    xc = np.ascontiguousarray(xc, dtype=np.float64)
    n, dim = x.shape
    nc = xc.shape[0]
    lib = get_lib()
    if lib is not None:
        idx = np.empty((n,), dtype=np.int32)
        lib.nearest_center(
            _dptr(x), n, _dptr(xc), nc, dim,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return idx
    d = (
        np.sum(x**2, -1)[:, None]
        + np.sum(xc**2, -1)[None, :]
        - 2.0 * (x @ xc.T)
    )
    return np.argmin(d, axis=1).astype(np.int32)


def sq_dist_matrix(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Exact squared-distance matrix ``[n, m]`` (native or NumPy)."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    n, dim = x.shape
    m = y.shape[0]
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, m), dtype=np.float64)
        lib.sq_dist_matrix(_dptr(x), n, _dptr(y), m, dim, _dptr(out))
        return out
    return (
        np.sum(x**2, -1)[:, None]
        + np.sum(y**2, -1)[None, :]
        - 2.0 * (x @ y.T)
    )


def ski_stats_accum(
    x: np.ndarray,
    y: np.ndarray,
    lo: np.ndarray,
    h: np.ndarray,
    sizes,
    z: np.ndarray,
    wty: np.ndarray,
    yty: np.ndarray,
) -> bool:
    """Accumulate one (x, y) chunk into SKI statistics IN PLACE.

    ``z [G, G]``, ``wty [G]``, ``yty [1]`` are float64 accumulators;
    returns True if the native path ran (False = caller must fall back
    to the device scatter, ``models/ski.py::compute_stats``).  The
    stencil is the same Keys cubic as the Python builder; accumulation
    is f64 regardless of data dtype.
    """
    lib = get_lib()
    if lib is None:
        return False
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    lo = np.ascontiguousarray(lo, dtype=np.float64)
    h = np.ascontiguousarray(h, dtype=np.float64)
    sz = np.ascontiguousarray(np.asarray(sizes), dtype=np.int32)
    m, d = x.shape
    rc = lib.ski_stats_accum(
        _dptr(x), _dptr(y), m, d, _dptr(lo), _dptr(h),
        sz.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _dptr(z), _dptr(wty), _dptr(yty),
    )
    return rc == 0


def gather_rows_f32(
    src: np.ndarray, idx: np.ndarray, out: np.ndarray
) -> bool:
    """``out[i] = src[idx[i]]`` for f32 row-major matrices (src may be
    an ``np.memmap``).  Returns True if the native path ran."""
    lib = get_lib()
    if lib is None:
        return False
    assert src.dtype == np.float32 and out.dtype == np.float32
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    n, row = src.shape
    lib.gather_rows_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, row,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        idx.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return True
