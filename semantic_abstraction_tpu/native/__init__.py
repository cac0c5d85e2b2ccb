"""Native (C++) host-side loader kernels with compile-on-first-use.

The shared library builds from ``loader_kernels.cc`` with g++ -O3
(-fopenmp when available) into a cache dir next to the source; loading
falls back to pure numpy silently if no toolchain is present, so the
framework never hard-depends on a compiler at runtime.

Python surface:
- ``available()`` -> bool
- ``weighted_sample(rng, probs, k, replace)`` — native counterpart of
  data.transforms.weighted_sample (same distribution, same ValueError
  contract on infeasible no-replacement draws)
- ``gather_rows(src, idx)`` / ``gather_axis1(src, idx)``
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sysconfig
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "loader_kernels.cc")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    cache_dir = os.environ.get(
        "SEMABS_NATIVE_CACHE", os.path.join(_HERE, ".build")
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "loader_kernels.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(_SRC)):
        # -ffp-contract=off: the mask kernels promise BIT-IDENTICAL
        # doubles to their numpy twins (tests/test_native.py); GCC's
        # default contraction would fuse the camera-transform
        # multiply-adds into FMAs, which round differently and could flip
        # a boundary pixel's frustum membership vs the fallback path
        base = ["g++", "-O3", "-march=native", "-ffp-contract=off",
                "-shared", "-fPIC", "-std=c++17"]
        for flags in (base + ["-fopenmp"], base):
            cmd = flags + [_SRC, "-o", lib_path + ".tmp"]
            try:
                subprocess.run(
                    cmd, check=True, capture_output=True, timeout=120
                )
                os.replace(lib_path + ".tmp", lib_path)
                break
            except (subprocess.CalledProcessError, FileNotFoundError,
                    subprocess.TimeoutExpired) as e:
                last_err = e
        else:
            logging.debug("native loader kernels unavailable: %s", last_err)
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError as e:
        logging.debug("failed to load native kernels: %s", e)
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.weighted_sample_without_replacement.restype = ctypes.c_int
    lib.weighted_sample_without_replacement.argtypes = [
        ctypes.c_int64, ctypes.c_int64, f64p, f64p, i64p,
    ]
    lib.weighted_sample_with_replacement.restype = ctypes.c_int
    lib.weighted_sample_with_replacement.argtypes = [
        ctypes.c_int64, ctypes.c_int64, f64p, f64p, i64p,
    ]
    lib.weighted_sample_alias.restype = ctypes.c_int
    lib.weighted_sample_alias.argtypes = [
        ctypes.c_int64, ctypes.c_int64, f64p, ctypes.c_double, f64p, i64p,
    ]
    lib.bounds_mask_f32.restype = ctypes.c_int
    lib.bounds_mask_f32.argtypes = [ctypes.c_int64, f32p, f64p, f64p, u8p]
    lib.frustum_mask_f32.restype = ctypes.c_int
    lib.frustum_mask_f32.argtypes = [
        ctypes.c_int64, f32p, f64p, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
        u8p,
    ]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def weighted_sample(rng: np.random.RandomState, probs: np.ndarray, k: int,
                    replace: bool) -> np.ndarray:
    lib = _lib()
    if lib is None:
        raise RuntimeError("native kernels unavailable")
    probs = np.ascontiguousarray(probs, np.float64)
    n = len(probs)
    out = np.empty(k, np.int64)
    if not replace:
        # count positives BEFORE drawing uniforms: the infeasible case
        # (the reference's replace=True fallback trigger) costs ~0.5 ms
        # instead of a wasted n-uniform draw + key pass.
        if int(np.count_nonzero(probs > 0)) < k:
            raise ValueError(
                f"cannot draw {k} without replacement from the "
                "positive-weight entries"
            )
        uniforms = rng.random_sample(n)
        rc = lib.weighted_sample_without_replacement(
            n, k, _ptr(probs, ctypes.c_double), _ptr(uniforms, ctypes.c_double),
            _ptr(out, ctypes.c_int64),
        )
        if rc != 0:
            raise ValueError(
                f"cannot draw {k} without replacement from the "
                "positive-weight entries"
            )
        return out
    wsum = float(probs.sum())
    if wsum <= 0:
        raise ValueError("probabilities sum to zero")
    u = rng.random_sample(k)
    rc = lib.weighted_sample_alias(
        n, k, _ptr(probs, ctypes.c_double), ctypes.c_double(wsum),
        _ptr(u, ctypes.c_double), _ptr(out, ctypes.c_int64),
    )
    if rc != 0:
        raise ValueError("sampling failed")
    return out


def bounds_mask(pts: np.ndarray, bounds: np.ndarray) -> Optional[np.ndarray]:
    """(N, 3) float32 points -> inclusive in-bounds bool mask, or None when
    the native path does not apply (caller falls back to numpy)."""
    lib = _lib()
    if lib is None or pts.dtype != np.float32 or pts.ndim != 2 \
            or pts.shape[1] != 3:
        return None
    pts = np.ascontiguousarray(pts)
    b = np.ascontiguousarray(np.asarray(bounds, np.float64))
    out = np.empty(len(pts), np.uint8)
    lib.bounds_mask_f32(
        len(pts), _ptr(pts, ctypes.c_float), _ptr(b[0], ctypes.c_double),
        _ptr(b[1], ctypes.c_double), _ptr(out, ctypes.c_uint8),
    )
    return out.view(bool)


def frustum_mask(pts: np.ndarray, depth_shape, cam_pose: np.ndarray,
                 cam_intr: np.ndarray) -> Optional[np.ndarray]:
    """(N, 3) float32 world points -> frustum-membership bool mask
    (bit-identical double arithmetic to check_pts_in_frustum_np), or None
    when the native path does not apply."""
    lib = _lib()
    if lib is None or pts.dtype != np.float32 or pts.ndim != 2 \
            or pts.shape[1] != 3:
        return None
    pts = np.ascontiguousarray(pts)
    inv = np.linalg.inv(np.asarray(cam_pose, dtype=np.float64))
    inv_rt = np.ascontiguousarray(inv[:3, :4])
    intr = np.asarray(cam_intr, np.float64)
    h, w = depth_shape
    out = np.empty(len(pts), np.uint8)
    lib.frustum_mask_f32(
        len(pts), _ptr(pts, ctypes.c_float), _ptr(inv_rt, ctypes.c_double),
        ctypes.c_double(intr[0, 0]), ctypes.c_double(intr[1, 1]),
        ctypes.c_double(intr[0, 2]), ctypes.c_double(intr[1, 2]),
        int(h), int(w), _ptr(out, ctypes.c_uint8),
    )
    return out.view(bool)


_GATHER_FNS = {
    np.dtype(np.float32): ("gather_rows_f32", ctypes.c_float),
    np.dtype(np.float64): ("gather_rows_f64", ctypes.c_double),
    np.dtype(np.int32): ("gather_rows_i32", ctypes.c_int32),
    np.dtype(np.int64): ("gather_rows_i64", ctypes.c_int64),
    np.dtype(np.uint8): ("gather_rows_u8", ctypes.c_uint8),
}


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """src (N, ...) rows at idx (K,) -> (K, ...). Falls back to numpy for
    unsupported dtypes."""
    lib = _lib()
    src = np.ascontiguousarray(src)
    if lib is None or src.dtype not in _GATHER_FNS:
        return src[idx]
    fn_name, ctype = _GATHER_FNS[src.dtype]
    n = src.shape[0]
    d = int(np.prod(src.shape[1:])) if src.ndim > 1 else 1
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx),) + src.shape[1:], src.dtype)
    rc = getattr(lib, fn_name)(
        ctypes.c_int64(n), ctypes.c_int64(d), ctypes.c_int64(len(idx)),
        _ptr(src, ctype), _ptr(idx, ctypes.c_int64), _ptr(out, ctype),
    )
    if rc != 0:
        raise IndexError("gather index out of range")
    return out


def gather_axis1(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """src (P, N, ...) at idx (K,) along axis 1 -> (P, K, ...)."""
    lib = _lib()
    src = np.ascontiguousarray(src)
    if lib is None or src.dtype != np.float32 or src.ndim < 2:
        return src[:, idx]
    p, n = src.shape[:2]
    c = int(np.prod(src.shape[2:])) if src.ndim > 2 else 1
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((p, len(idx)) + src.shape[2:], src.dtype)
    rc = lib.gather_axis1_f32(
        ctypes.c_int64(p), ctypes.c_int64(n), ctypes.c_int64(c),
        ctypes.c_int64(len(idx)),
        _ptr(src, ctypes.c_float), _ptr(idx, ctypes.c_int64),
        _ptr(out, ctypes.c_float),
    )
    if rc != 0:
        raise IndexError("gather index out of range")
    return out
