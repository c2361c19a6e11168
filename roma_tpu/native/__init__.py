"""ctypes bindings for the native two-view geometry library
(native/ransac/ransac.cpp) — the self-contained replacement for the
reference's poselib/OpenCV C++ dependencies (SURVEY.md §2.9).

The library is built on first use (g++ -O3 -shared); if no compiler is
available the callers fall back to OpenCV.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native", "ransac")
_LIB_NAME = "libroma_ransac.so"
_lib = None


def _build() -> str:
    lib_path = os.path.join(_SRC_DIR, _LIB_NAME)
    src = os.path.join(_SRC_DIR, "ransac.cpp")
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
        subprocess.run(["make", "-C", _SRC_DIR], check=True, capture_output=True)
    return lib_path


def load():
    """Load (building if needed) the native library; raises on failure."""
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.estimate_relative_pose.restype = ctypes.c_int
        lib.estimate_relative_pose.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.estimate_homography.restype = ctypes.c_int
        lib.estimate_homography.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def estimate_relative_pose(
    kpts1: np.ndarray,
    kpts2: np.ndarray,
    K1: np.ndarray,
    K2: np.ndarray,
    threshold: float = 0.5,
    max_iters: int = 10000,
    seed: int = 0,
):
    """Calibrated relative pose via the native essential RANSAC.

    kpts in pixels; threshold in pixels (converted to normalized units with
    the mean focal, matching the reference convention utils.py:85-87).
    Returns (R (3,3), t (3,), inliers (n,) bool) or None.
    """
    lib = load()
    x1 = ((kpts1 - K1[None, :2, 2]) @ np.linalg.inv(K1[:2, :2]).T).astype(np.float64)
    x2 = ((kpts2 - K2[None, :2, 2]) @ np.linalg.inv(K2[:2, :2]).T).astype(np.float64)
    norm_thresh = threshold / (
        np.mean(np.abs(K1[:2, :2])) + np.mean(np.abs(K2[:2, :2]))
    )
    n = len(x1)
    x1 = np.ascontiguousarray(x1)
    x2 = np.ascontiguousarray(x2)
    R = np.zeros((3, 3), np.float64)
    t = np.zeros(3, np.float64)
    inl = np.zeros(n, np.uint8)
    cnt = lib.estimate_relative_pose(
        _dptr(x1), _dptr(x2), n, float(norm_thresh), int(max_iters),
        int(seed), _dptr(R), _dptr(t),
        inl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if cnt <= 0:
        return None
    return R, t, inl.astype(bool)


def estimate_homography(
    kpts1: np.ndarray,
    kpts2: np.ndarray,
    threshold: float = 3.0,
    max_iters: int = 10000,
    seed: int = 0,
):
    """Homography RANSAC in pixel coordinates. Returns (H (3,3), inliers) or None."""
    lib = load()
    n = len(kpts1)
    x1 = np.ascontiguousarray(kpts1, np.float64)
    x2 = np.ascontiguousarray(kpts2, np.float64)
    H = np.zeros((3, 3), np.float64)
    inl = np.zeros(n, np.uint8)
    cnt = lib.estimate_homography(
        _dptr(x1), _dptr(x2), n, float(threshold), int(max_iters), int(seed),
        _dptr(H), inl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if cnt <= 0:
        return None
    return H, inl.astype(bool)
