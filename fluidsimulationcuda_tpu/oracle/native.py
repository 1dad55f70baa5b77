"""ctypes bindings for the native C++ CPU engine (csrc/fluidcore.cpp).

Builds on demand with g++ (-O3 -march=native -fopenmp) into
``build/fluidcore.so``.  The native engine is the modern counterpart of the
reference's sequential + SIMD-SSE families: an independent, fast CPU
implementation used as a cross-check oracle and CPU baseline.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "load", "step", "jacobi", "advect", "NativeEngine"]

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "fluidcore.cpp")
_OUT = os.path.join(_ROOT, "build", "fluidcore.so")

_lock = threading.Lock()
_lib = None
_f32p = ctypes.POINTER(ctypes.c_float)


def _build() -> str:
    os.makedirs(os.path.dirname(_OUT), exist_ok=True)
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-fopenmp", "-o", _OUT, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # Retry without OpenMP (always keep a working scalar build).
        cmd = [c for c in cmd if c != "-fopenmp"]
        subprocess.run(cmd, check=True, capture_output=True)
    return _OUT


def load():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.fluidcore_step.argtypes = [_f32p] * 6 + [
                ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_int,
            ]
            lib.fluidcore_jacobi.argtypes = [_f32p, _f32p, ctypes.c_int,
                                             ctypes.c_int, ctypes.c_float,
                                             ctypes.c_float, ctypes.c_int]
            lib.fluidcore_advect.argtypes = [_f32p] * 4 + [
                ctypes.c_int, ctypes.c_int, ctypes.c_float]
            lib.fluidcore_num_threads.restype = ctypes.c_int
            _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _ptr(a: np.ndarray):
    assert a.dtype == np.float32 and a.flags["C_CONTIGUOUS"]
    return a.ctypes.data_as(_f32p)


def step(dens, u, v, dens_src, u_src, v_src, *, n, dt, visc, diff, iters):
    """One full timestep, in place on float32 (n+2, n+2) arrays."""
    lib = load()
    for a in (dens, u, v):
        assert a.shape == (n + 2, n + 2)
    lib.fluidcore_step(
        _ptr(dens), _ptr(u), _ptr(v), _ptr(dens_src), _ptr(u_src),
        _ptr(v_src), n, dt, visc, diff, iters,
    )
    return dens, u, v


def jacobi(x, x0, *, n, mode, alpha, beta, iters):
    lib = load()
    x = np.ascontiguousarray(x, np.float32).copy()
    lib.fluidcore_jacobi(_ptr(x), _ptr(np.ascontiguousarray(x0, np.float32)),
                         n, mode, alpha, beta, iters)
    return x


def advect(d0, u, v, *, n, mode, dt):
    lib = load()
    out = np.zeros_like(d0)
    lib.fluidcore_advect(_ptr(out), _ptr(d0), _ptr(u), _ptr(v), n, mode, dt)
    return out


class NativeEngine:
    """Stateful convenience wrapper mirroring the JAX model API."""

    def __init__(self, cfg):
        self.cfg = cfg
        load()

    def step(self, state_arrays, source_arrays):
        dens, u, v = (np.array(a, np.float32, copy=True) for a in state_arrays)
        ds, us, vs = (np.ascontiguousarray(a, np.float32) for a in source_arrays)
        c = self.cfg
        return step(dens, u, v, ds, us, vs, n=c.n, dt=c.dt, visc=c.visc,
                    diff=c.diff, iters=c.jacobi_iters)
