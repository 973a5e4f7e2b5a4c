"""ctypes bridge to the native C++ runtime components (native/*.cpp).

The device compute path is jitted JAX; the per-frame host bookkeeping (track
stores + padded-batch assembly) has a C++ implementation mirroring the
reference's C++ `FeatureDatabase`, loaded here via ctypes.  Falls back to
pure Python (`update/feature_db.py`) when the shared library is absent.

Build: `make -C native` (produces native/libplviwo_native.so).
"""

from __future__ import annotations

import ctypes as C
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native",
                         "libplviwo_native.so")
_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = C.CDLL(_LIB_PATH)
    lib.fdb_create.restype = C.c_void_p
    lib.fdb_destroy.argtypes = [C.c_void_p]
    lib.fdb_update.argtypes = [C.c_void_p, C.c_int64] + [C.c_double] * 5
    lib.fdb_update_batch.argtypes = [
        C.c_void_p, C.POINTER(C.c_int64), C.POINTER(C.c_double),
        C.POINTER(C.c_double), C.c_int64, C.c_double,
    ]
    lib.fdb_cleanup.argtypes = [C.c_void_p, C.c_double]
    lib.fdb_remove.argtypes = [C.c_void_p, C.POINTER(C.c_int64), C.c_int64]
    lib.fdb_size.argtypes = [C.c_void_p]
    lib.fdb_size.restype = C.c_int64
    lib.fdb_export_msckf.restype = C.c_int64
    lib.fdb_export_msckf.argtypes = [
        C.c_void_p,
        C.POINTER(C.c_double), C.POINTER(C.c_int32), C.c_int64,
        C.POINTER(C.c_double), C.c_int64, C.c_double,
        C.c_int64, C.c_int64, C.c_int64,
        C.POINTER(C.c_double), C.POINTER(C.c_double),
        C.POINTER(C.c_int32), C.POINTER(C.c_int32), C.POINTER(C.c_double),
        C.POINTER(C.c_double),
        C.POINTER(C.c_uint8), C.POINTER(C.c_int64),
    ]
    lib.csv_open.restype = C.c_void_p
    lib.csv_open.argtypes = [C.c_char_p, C.c_long]
    lib.csv_rows.argtypes = [C.c_void_p]
    lib.csv_rows.restype = C.c_long
    lib.csv_cols.argtypes = [C.c_void_p]
    lib.csv_cols.restype = C.c_long
    lib.csv_copy.argtypes = [C.c_void_p, C.POINTER(C.c_double)]
    lib.csv_free.argtypes = [C.c_void_p]
    _lib = lib
    return lib


def load_csv(path: str, ncols: int = 0):
    """Native CSV parse -> (rows, cols) float64 array, or None if the
    native library is unavailable (callers fall back to the Python parser).
    Semantics mirror data/kaist._load_csv: commas are separators and lines
    with non-numeric tokens are skipped."""
    lib = _load()
    if lib is None:
        return None
    h = lib.csv_open(path.encode(), int(ncols))
    if not h:
        return None
    try:
        n, m = lib.csv_rows(h), lib.csv_cols(h)
        out = np.zeros((n, m), dtype=np.float64)
        if n:
            lib.csv_copy(h, _ptr(out, C.c_double))
        return out
    finally:
        lib.csv_free(h)


def _ptr(arr, ctype):
    return arr.ctypes.data_as(C.POINTER(ctype))


class NativeFeatureDatabase:
    """C++-backed feature DB with the same surface as FeatureDatabase plus a
    one-call padded MSCKF batch export."""

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("libplviwo_native.so not built (make -C native)")
        self._lib = lib
        self._h = lib.fdb_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fdb_destroy(self._h)
            self._h = None

    def update_batch(self, fids, t, uvs, uvns):
        fids = np.ascontiguousarray(fids, dtype=np.int64)
        uvs = np.ascontiguousarray(uvs, dtype=np.float64)
        uvns = np.ascontiguousarray(uvns, dtype=np.float64)
        self._lib.fdb_update_batch(
            self._h, _ptr(fids, C.c_int64), _ptr(uvs, C.c_double),
            _ptr(uvns, C.c_double), len(fids), float(t))

    def update(self, fid, t, uv, uvn):
        self._lib.fdb_update(self._h, int(fid), float(t),
                             float(uv[0]), float(uv[1]),
                             float(uvn[0]), float(uvn[1]))

    def cleanup(self, t_min):
        self._lib.fdb_cleanup(self._h, float(t_min))

    def remove(self, fids):
        fids = np.ascontiguousarray(list(fids), dtype=np.int64)
        if len(fids):
            self._lib.fdb_remove(self._h, _ptr(fids, C.c_int64), len(fids))

    def __len__(self):
        return int(self._lib.fdb_size(self._h))

    def export_msckf(self, clone_t, clone_slot, marg_t, t_frame,
                     min_track, max_msckf, max_obs):
        """Returns (n, fids, uv, uvn, s0, s1, lam, t, valid) padded arrays."""
        clone_t = np.ascontiguousarray(clone_t, dtype=np.float64)
        clone_slot = np.ascontiguousarray(clone_slot, dtype=np.int32)
        marg_t = np.ascontiguousarray(marg_t, dtype=np.float64)
        F, O = int(max_msckf), int(max_obs)
        uv = np.zeros((F, O, 2))
        uvn = np.zeros((F, O, 2))
        s0 = np.zeros((F, O), dtype=np.int32)
        s1 = np.zeros((F, O), dtype=np.int32)
        lam = np.zeros((F, O))
        obs_t = np.zeros((F, O))
        valid = np.zeros((F, O), dtype=np.uint8)
        fids = np.full(F, -1, dtype=np.int64)
        n = self._lib.fdb_export_msckf(
            self._h, _ptr(clone_t, C.c_double), _ptr(clone_slot, C.c_int32),
            len(clone_t), _ptr(marg_t, C.c_double), len(marg_t),
            float(t_frame), int(min_track), F, O,
            _ptr(uv, C.c_double), _ptr(uvn, C.c_double),
            _ptr(s0, C.c_int32), _ptr(s1, C.c_int32), _ptr(lam, C.c_double),
            _ptr(obs_t, C.c_double),
            _ptr(valid, C.c_uint8), _ptr(fids, C.c_int64))
        return int(n), fids, uv, uvn, s0, s1, lam, obs_t, valid.astype(bool)
