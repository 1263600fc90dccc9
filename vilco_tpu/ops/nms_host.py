"""ctypes bindings for the native C++ (Soft-)NMS (native/nms1d.cc).

Host-side counterpart of the on-device NMS (vilco_tpu/ops/nms.py) — used for
offline tooling and parity tests, replacing the reference's pybind11 CPU
extension (MQ/libs/utils/csrc/nms_cpu.cpp + setup.py). The library is built
on demand with g++ (no pip install required) and cached.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_NATIVE = os.path.join(_ROOT, "native")
_SO = os.path.join(_NATIVE, "build", "libnms1d.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", _NATIVE], check=True,
                   capture_output=True)


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        _build()
    lib = ctypes.CDLL(_SO)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.nms1d_hard.restype = ctypes.c_int64
    lib.nms1d_hard.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_int64, i64p,
    ]
    lib.nms1d_soft.restype = ctypes.c_int64
    lib.nms1d_soft.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_int64, f32p, i64p,
    ]
    _lib = lib
    return lib


def nms_1d_host(
    segs: np.ndarray, scores: np.ndarray, iou_threshold: float,
    max_out: Optional[int] = None,
) -> np.ndarray:
    """Hard NMS; returns kept indices sorted by descending score."""
    lib = load_library()
    segs = np.ascontiguousarray(segs, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(scores)
    max_out = max_out or n
    out = np.empty(max_out, np.int64)
    k = lib.nms1d_hard(segs, scores, n, float(iou_threshold), max_out, out)
    return out[:k]


def soft_nms_1d_host(
    segs: np.ndarray, scores: np.ndarray, iou_threshold: float,
    sigma: float, min_score: float, method: str = "gaussian",
    max_out: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Soft NMS; returns (segs (K,2), decayed scores (K,), indices (K,))."""
    lib = load_library()
    segs = np.ascontiguousarray(segs, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(scores)
    max_out = max_out or n
    dets = np.empty((max_out, 3), np.float32)
    inds = np.empty(max_out, np.int64)
    m = {"hard": 0, "linear": 1, "gaussian": 2}[method]
    k = lib.nms1d_soft(
        segs, scores, n, float(iou_threshold), float(sigma),
        float(min_score), m, max_out, dets.reshape(-1), inds,
    )
    return dets[:k, :2], dets[:k, 2], inds[:k]
