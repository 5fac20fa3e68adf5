"""ctypes bindings for the native (C++) data-path kernels.

The shared library is compiled on first use with ``g++ -O3`` and cached next
to the source (``native/window_builder.cpp``).  Every native entry point has
a pure-numpy fallback with identical semantics, used when no compiler is
available — behavior is bit-identical (memcpy of float32 either way) and
covered by equivalence tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "window_builder.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libwindow_builder.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                # atomic publish (see utils/ledger.py): concurrent workers
                # must never dlopen a half-written .so
                tmp = f"{_SO}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True)
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            lib.build_windows_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            lib.build_windows_f32.restype = None
            _lib = lib
        except Exception:
            _lib_failed = True
            _lib = None
        return _lib


def build_windows_numpy(qs: np.ndarray, ili: np.ndarray, *,
                        window_size: int, lag: int, gamma: int,
                        run_backward: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-numpy reference implementation (same layout as the C++ kernel)."""
    n_days, n_regions, n_qs = qs.shape
    in_len = window_size + lag
    y_len = window_size + 1 + gamma if run_backward else gamma
    nw = max(n_days - gamma - (window_size + 1), 0)
    feat = n_regions * n_qs + n_regions

    x = np.empty((nw, in_len, feat), np.float32)
    y = np.empty((nw, y_len, n_regions), np.float32)
    for w in range(nw):
        b = w + window_size + 1
        lo = b - window_size - 1
        win_q = qs[lo: lo + in_len]                        # (in_len, R, Q)
        x[w, :, : n_regions * n_qs] = win_q.reshape(in_len, -1)
        x[w, :, n_regions * n_qs:] = ili[lo: lo + in_len]
        x[w, -lag:, n_regions * n_qs:] = -1.0
        start = lo if run_backward else b
        y[w] = ili[start: start + y_len]
    return x, y


def build_windows_fast(qs: np.ndarray, ili: np.ndarray, *,
                       window_size: int, lag: int, gamma: int,
                       run_backward: bool = True
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Sliding training windows with the reference layout
    (lib/regional_data_builder.py:219-251), native when possible.

    qs: (n_days, n_regions, n_qs) float32 normalized queries;
    ili: (n_days, n_regions) float32 normalized ILI.
    Returns (x (N, window+lag, R*Q+R), y (N, y_len, R)).
    """
    qs = np.ascontiguousarray(qs, np.float32)
    ili = np.ascontiguousarray(ili, np.float32)
    lib = _load()
    if lib is None:
        return build_windows_numpy(qs, ili, window_size=window_size, lag=lag,
                                   gamma=gamma, run_backward=run_backward)
    n_days, n_regions, n_qs = qs.shape
    in_len = window_size + lag
    y_len = window_size + 1 + gamma if run_backward else gamma
    nw = max(n_days - gamma - (window_size + 1), 0)
    feat = n_regions * n_qs + n_regions
    x = np.empty((nw, in_len, feat), np.float32)
    y = np.empty((nw, y_len, n_regions), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.build_windows_f32(
        qs.ctypes.data_as(fp), ili.ctypes.data_as(fp),
        n_days, n_regions, n_qs, window_size, lag, gamma,
        1 if run_backward else 0,
        x.ctypes.data_as(fp), y.ctypes.data_as(fp))
    return x, y
