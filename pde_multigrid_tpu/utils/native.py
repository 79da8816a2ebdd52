"""ctypes bindings for the native C++ golden-model backend (native/golden.cpp).

Builds the shared library on first use (g++ -O2; cached under
native/build/) and exposes `golden_solve(...)` mirroring the JAX solver's
parity surface.  Used by tests/test_native.py for cross-language
verification — the role the reference's CPU apps played for its CUDA
kernels (SURVEY.md §4.6)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_ROOT, "native", "golden.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libgolden.so")

_lock = threading.Lock()
_lib = None

PROBLEM_IDS = {"ode1d": 0, "lyapunov2d": 1, "poisson": 2, "hjb2d": 3}


def build_library(force: bool = False) -> str:
    """Compile native/golden.cpp to a shared library (idempotent)."""
    with _lock:
        if not force and os.path.exists(_LIB) and os.path.getmtime(
            _LIB
        ) >= os.path.getmtime(_SRC):
            return _LIB
        os.makedirs(_BUILD_DIR, exist_ok=True)
        cmd = [
            "g++",
            "-O2",
            "-march=native",
            "-shared",
            "-fPIC",
            "-std=c++17",
            _SRC,
            "-o",
            _LIB,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.mg_solve.restype = ctypes.c_double
        lib.mg_solve.argtypes = [
            ctypes.c_int,  # problem
            ctypes.c_int,  # nd
            ctypes.POINTER(ctypes.c_int),  # shape
            ctypes.POINTER(ctypes.c_double),  # domain_lo
            ctypes.POINTER(ctypes.c_double),  # domain_hi
            ctypes.c_int,  # kind (0 fmg, 1 v)
            ctypes.c_int,  # nu0
            ctypes.c_int,  # nu1
            ctypes.c_int,  # nu2
            ctypes.c_int,  # max_cycles
            ctypes.POINTER(ctypes.c_double),  # lyap A
            ctypes.c_double,  # lyap alpha
            ctypes.c_double,  # hjb pin-ball radius (cells)
            ctypes.POINTER(ctypes.c_float),  # out_v
        ]
        _lib = lib
    return _lib


def golden_solve(
    problem: str,
    shape: tuple[int, ...],
    domain: tuple[tuple[float, float], ...],
    kind: str = "fmg",
    nu0: int = 2,
    nu1: int = 2,
    nu2: int = 2,
    max_cycles: int = 1,
    lyap_a=((-1.0, -2.0), (0.0, -3.0)),
    lyap_alpha: float = 2.0,
    hjb_pin_cells: float = 2.0,
):
    """Run the C++ golden model; returns (v, residual_l2)."""
    lib = _load()
    nd = len(shape)
    shp = (ctypes.c_int * 3)(*list(shape) + [1] * (3 - nd))
    lo = (ctypes.c_double * 3)(*[d[0] for d in domain] + [0.0] * (3 - nd))
    hi = (ctypes.c_double * 3)(*[d[1] for d in domain] + [1.0] * (3 - nd))
    a_flat = np.asarray(lyap_a, np.float64).ravel()
    a_c = (ctypes.c_double * 4)(*a_flat)
    out = np.zeros(shape, np.float32)
    res = lib.mg_solve(
        PROBLEM_IDS["poisson" if problem.startswith("poisson") else problem],
        nd,
        shp,
        lo,
        hi,
        0 if kind == "fmg" else 1,
        nu0,
        nu1,
        nu2,
        max_cycles,
        a_c,
        lyap_alpha,
        hjb_pin_cells,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, float(res)
