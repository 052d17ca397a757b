"""ctypes binding for the native COCO matcher (csrc/coco_matcher.cpp).

Compiles the shared library on first use (g++ is in the toolchain);
falls back to None when compilation fails so coco_eval_np keeps its
pure-numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "csrc", "coco_matcher.cpp")
    out = os.path.join(os.path.dirname(src), "libcocomatch.so")
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(out)
        lib.match_greedy.argtypes = [
            ctypes.POINTER(ctypes.c_double),   # ious
            ctypes.POINTER(ctypes.c_uint8),    # g_ignore
            ctypes.POINTER(ctypes.c_uint8),    # g_crowd
            ctypes.POINTER(ctypes.c_double),   # iou_thrs
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),    # out_dt_m
            ctypes.POINTER(ctypes.c_uint8),    # out_dt_ig
        ]
        lib.match_greedy.restype = None
        return lib
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
    return _LIB


def match_greedy(ious: np.ndarray, g_ignore: np.ndarray,
                 g_crowd: np.ndarray, iou_thrs: np.ndarray
                 ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Run the native matcher; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nd, ng = ious.shape
    t = len(iou_thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    gi = np.ascontiguousarray(g_ignore, np.uint8)
    gc = np.ascontiguousarray(g_crowd, np.uint8)
    thrs = np.ascontiguousarray(iou_thrs, np.float64)
    dt_m = np.empty((t, nd), np.int64)
    dt_ig = np.empty((t, nd), np.uint8)
    lib.match_greedy(
        ious.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        gi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        gc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        thrs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t, nd, ng,
        dt_m.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dt_ig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dt_m, dt_ig.astype(bool)
