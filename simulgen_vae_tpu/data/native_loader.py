"""ctypes bindings for the native (C++) batch assembler.

Compiles ``native/batch_gather.cc`` lazily on first use (g++) and binds it
via ctypes (no pybind11 in this environment).  Falls back to numpy when the
toolchain or library is unavailable — all callers behave identically either
way; the native path is a speedup, not a dependency.

bfloat16 outputs use ``ml_dtypes.bfloat16`` (a jax dependency), so the
resulting numpy arrays feed ``jax.device_put`` without further conversion.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

try:
    import ml_dtypes

    BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    BF16 = None

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "batch_gather.cc")
_LIB_PATH = os.path.join(_REPO, "native", "libsgvae_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC):
            if not _build():
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.sgvae_gather_rows_f32.argtypes = [
            f32p, ctypes.c_int64, i64p, ctypes.c_int64, f32p, ctypes.c_int,
        ]
        lib.sgvae_gather_rows_f32_bf16.argtypes = [
            f32p, ctypes.c_int64, i64p, ctypes.c_int64, u16p, ctypes.c_int,
        ]
        lib.sgvae_affine_rows_f32.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, f32p, f32p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _nthreads() -> int:
    return min(os.cpu_count() or 1, 16)


def gather_rows(src: np.ndarray, indices: np.ndarray,
                to_bf16: bool = False) -> np.ndarray:
    """dst[i] = src[indices[i]] over the leading axis, optionally downcast
    to bfloat16 in the same pass.  numpy fallback when native is missing."""
    src = np.ascontiguousarray(src)
    lead = src.shape[0]
    row_shape = src.shape[1:]
    row_elems = int(np.prod(row_shape)) if row_shape else 1
    idx = np.ascontiguousarray(indices, np.int64)
    lib = get_lib() if src.dtype == np.float32 else None

    if lib is None:
        out = src[idx]
        if to_bf16 and BF16 is not None:
            out = out.astype(BF16)
        return out

    flat = src.reshape(lead, row_elems)
    n = idx.shape[0]
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    if to_bf16 and BF16 is not None:
        dst = np.empty((n, row_elems), np.uint16)
        lib.sgvae_gather_rows_f32_bf16(
            flat.ctypes.data_as(f32p), row_elems,
            idx.ctypes.data_as(i64p), n,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), _nthreads(),
        )
        return dst.view(BF16).reshape((n,) + row_shape)
    dst = np.empty((n, row_elems), np.float32)
    lib.sgvae_gather_rows_f32(
        flat.ctypes.data_as(f32p), row_elems,
        idx.ctypes.data_as(i64p), n,
        dst.ctypes.data_as(f32p), _nthreads(),
    )
    return dst.reshape((n,) + row_shape)


def affine_rows_inplace(data: np.ndarray, scale: np.ndarray,
                        minv: np.ndarray) -> bool:
    """data = data * scale + minv row-wise, in place (native); False if the
    native library is unavailable (caller should use numpy)."""
    lib = get_lib()
    if lib is None or data.dtype != np.float32 or not data.flags["C_CONTIGUOUS"]:
        return False
    n_rows = int(np.prod(data.shape[:-1]))
    row_elems = data.shape[-1]
    scale = np.ascontiguousarray(scale, np.float32)
    minv = np.ascontiguousarray(minv, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.sgvae_affine_rows_f32(
        data.ctypes.data_as(f32p), n_rows, row_elems,
        scale.ctypes.data_as(f32p), minv.ctypes.data_as(f32p), _nthreads(),
    )
    return True
