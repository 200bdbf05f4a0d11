"""ctypes bindings for the native loader core (graceful numpy fallback).

Load via :func:`available`; every function mirrors a numpy-path operation in
`streammos_tpu.data.dataset` with identical semantics (see loader.cpp header).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        from streammos_tpu.native.build import build
        path = build()
        lib = ctypes.CDLL(path)
    except Exception:
        _LIB = None
        return None

    i64, u64 = ctypes.c_int64, ctypes.c_uint64
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.smt_load_scan.restype = i64
    lib.smt_load_scan.argtypes = [ctypes.c_char_p, fp, i64]
    lib.smt_load_labels.restype = i64
    lib.smt_load_labels.argtypes = [ctypes.c_char_p, u32p, i64]
    lib.smt_transform.restype = None
    lib.smt_transform.argtypes = [fp, i64, dp]
    lib.smt_filter.restype = i64
    lib.smt_filter.argtypes = [fp, i64, fp, fp, u8p]
    lib.smt_resample_indices.restype = None
    lib.smt_resample_indices.argtypes = [i64, i64, u64, i32p]
    lib.smt_assemble_eval_frame.restype = i64
    lib.smt_assemble_eval_frame.argtypes = [ctypes.c_char_p, dp, fp, i64, fp,
                                            u8p, i64,
                                            ctypes.POINTER(ctypes.c_int64)]
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


_SCAN_CAP = 1 << 21


def load_scan(path: str) -> np.ndarray:
    lib = _lib()
    buf = np.empty((_SCAN_CAP, 4), np.float32)
    n = lib.smt_load_scan(path.encode(), buf, _SCAN_CAP)
    if n < 0:
        raise IOError(f"cannot read {path}")
    return buf[:n].copy()


def load_labels(path: str) -> np.ndarray:
    lib = _lib()
    buf = np.empty(_SCAN_CAP, np.uint32)
    n = lib.smt_load_labels(path.encode(), buf, _SCAN_CAP)
    if n < 0:
        raise IOError(f"cannot read {path}")
    return buf[:n].copy()


def transform(pts: np.ndarray, mat: np.ndarray) -> np.ndarray:
    lib = _lib()
    out = np.ascontiguousarray(pts, np.float32).copy()
    lib.smt_transform(out, out.shape[0], np.ascontiguousarray(mat, np.float64))
    return out


def filter_points(pts: np.ndarray, lims) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (compacted points, bool mask over input)."""
    lib = _lib()
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.empty_like(pts)
    mask = np.empty(pts.shape[0], np.uint8)
    m = lib.smt_filter(pts, pts.shape[0],
                       np.asarray(lims, np.float32), out, mask)
    return out[:m].copy(), mask.astype(bool)


def resample_indices(n: int, n_out: int, seed: int) -> np.ndarray:
    lib = _lib()
    idx = np.empty(n_out, np.int32)
    lib.smt_resample_indices(n, n_out, seed & 0xFFFFFFFFFFFFFFFF, idx)
    return idx


def assemble_eval_frame(path: str, mat: np.ndarray, lims, n_out: int
                        ) -> Tuple[np.ndarray, int, np.ndarray]:
    """Fused load+transform+crop+pad. Returns (frame (n_out, 4), n_valid,
    valid mask over the raw scan)."""
    lib = _lib()
    out = np.empty((n_out, 4), np.float32)
    mask = np.zeros(_SCAN_CAP, np.uint8)
    n_raw = ctypes.c_int64(0)
    n = lib.smt_assemble_eval_frame(
        path.encode(), np.ascontiguousarray(mat, np.float64),
        np.asarray(lims, np.float32), n_out, out, mask, _SCAN_CAP,
        ctypes.byref(n_raw))
    if n == -1:
        raise IOError(f"cannot read {path}")
    if n == -2:
        raise ValueError(f"frame_point_num {n_out} too small for {path}")
    if n < 0:
        raise RuntimeError(f"native loader error {n}")
    return out, int(n), mask[:n_raw.value].astype(bool)
