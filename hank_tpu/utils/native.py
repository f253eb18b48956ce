"""ctypes bindings for the native C++ dual-number benchmark library.

Capability parity with the reference's vendored C++ benchmark suite
(SURVEY §2.9): hand-rolled dual numbers with chunked gradient drivers on the
ackley / rosenbrock test functions, used to calibrate the AD engine against
native code. Builds `native/libhank_native.so` on demand (g++, no external
deps) and exposes gradient + timing entry points.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, os.pardir, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhank_native.so")
_lib = None


def _build() -> None:
    subprocess.run(["make", "-s", "libhank_native.so"], cwd=_NATIVE_DIR,
                   check=True)


def load():
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    for fn_name in ("ackley", "rosenbrock"):
        for chunk in (1, 4, 8):
            f = getattr(lib, f"{fn_name}_grad_chunk{chunk}")
            f.argtypes = [dp, dp, ctypes.c_int]
            f.restype = None
        v = getattr(lib, f"{fn_name}_value")
        v.argtypes = [dp, ctypes.c_int]
        v.restype = ctypes.c_double
    lib.bench_gradient.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int]
    lib.bench_gradient.restype = ctypes.c_double
    _lib = lib
    return lib


def gradient(which: str, x: np.ndarray, chunk: int = 8) -> np.ndarray:
    """Native chunked forward-mode gradient of ackley/rosenbrock at x."""
    lib = load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    fn = getattr(lib, f"{which}_grad_chunk{chunk}")
    dp = ctypes.POINTER(ctypes.c_double)
    fn(x.ctypes.data_as(dp), g.ctypes.data_as(dp), len(x))
    return g


def value(which: str, x: np.ndarray) -> float:
    lib = load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    return float(getattr(lib, f"{which}_value")(x.ctypes.data_as(dp), len(x)))


def bench(which: str = "rosenbrock", chunk: int = 8, n: int = 1000,
          iters: int = 1000) -> float:
    """Seconds per native gradient evaluation."""
    lib = load()
    return float(lib.bench_gradient(which.encode(), chunk, n, iters))
