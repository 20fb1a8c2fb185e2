"""Native (C++) host-side components, loaded via ctypes.

Compiled on demand with the system toolchain and cached next to the sources;
every entry point has a pure-Python fallback, so the package works without a
compiler (the native path is a speedup, never a requirement).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, '_spotlight_native.so')
_SOURCES = [os.path.join(_HERE, 'markov.cpp')]

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
           '-o', _LIB_PATH] + _SOURCES
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            newest_source = max(os.path.getmtime(s) for s in _SOURCES)
            if (not os.path.exists(_LIB_PATH) or
                    os.path.getmtime(_LIB_PATH) < newest_source):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.markov_walk.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.markov_walk.restype = None
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def markov_walk(cumulative, rvs, state, out=None):
    """Order-k Markov walk over cumulative transition rows.

    Parameters
    ----------
    cumulative : (num_states, num_states) float64, C-contiguous
        Per-state cumulative transition probabilities.
    rvs : (num_steps,) float64 uniform draws
    state : (order,) int64 initial window — read only (``ascontiguousarray``
        may copy, so the caller's array is never reliably advanced; callers
        needing the final window should derive it from the returned states)
    out : optional (num_steps,) int32 output buffer

    Returns
    -------
    (num_steps,) int32 generated states, or None when the native library is
    unavailable (callers fall back to the Python loop).
    """
    lib = load()
    if lib is None:
        return None

    cumulative = np.ascontiguousarray(cumulative, dtype=np.float64)
    rvs = np.ascontiguousarray(rvs, dtype=np.float64)
    state = np.ascontiguousarray(state, dtype=np.int64)
    if out is None:
        out = np.empty(len(rvs), dtype=np.int32)

    lib.markov_walk(
        cumulative.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(cumulative.shape[0]),
        ctypes.c_int64(len(state)),
        rvs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(rvs)),
        state.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
