"""ctypes bindings for the native C++ support library (native/tfhe_native.cpp).

Builds lazily via `make -C native` on first use if the shared object is
missing (g++ is assumed present on dev hosts; absence degrades gracefully —
callers should treat `load()` returning None as "native oracle unavailable").
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_repo_root(), "native", "libtfhe_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.dirname(so)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.negacyclic_mul32.argtypes = [i32p, i32p, i32p, ctypes.c_int]
    lib.negacyclic_mul64.argtypes = [i64p, i32p, i64p, ctypes.c_int]
    lib.anticyclic_fft_i32.argtypes = [f64p, f64p, i32p, ctypes.c_int]
    lib.anticyclic_fft_i64.argtypes = [f64p, f64p, i64p, ctypes.c_int]
    lib.anticyclic_ifft_t64.argtypes = [i64p, f64p, f64p, ctypes.c_int]
    lib.anticyclic_ifft_t32.argtypes = [i32p, f64p, f64p, ctypes.c_int]
    lib.lagrange_addmul.argtypes = [f64p] * 6 + [ctypes.c_int]
    lib.decompose64.argtypes = [i32p, i64p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_uint64]
    lib.decompose32.argtypes = [i32p, i32p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_uint32]
    _LIB = lib
    return lib


def negacyclic_mul32(a, b):
    lib = load()
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    out = np.zeros_like(b)
    lib.negacyclic_mul32(out, a, b, len(a))
    return out


def negacyclic_mul64(a, b):
    lib = load()
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int64)
    out = np.zeros_like(b)
    lib.negacyclic_mul64(out, a, b, len(a))
    return out


def anticyclic_fft(a):
    lib = load()
    a = np.ascontiguousarray(a)
    n = len(a)
    re = np.zeros(n // 2)
    im = np.zeros(n // 2)
    if a.dtype == np.int64:
        lib.anticyclic_fft_i64(re, im, a, n)
    else:
        lib.anticyclic_fft_i32(re, im, np.ascontiguousarray(a, np.int32), n)
    return re, im


def anticyclic_ifft_t64(re, im):
    lib = load()
    n = 2 * len(re)
    out = np.zeros(n, np.int64)
    lib.anticyclic_ifft_t64(out, np.ascontiguousarray(re),
                            np.ascontiguousarray(im), n)
    return out


def decompose64(x, l, bgbit, offset):
    lib = load()
    x = np.ascontiguousarray(x, np.int64)
    out = np.zeros((l, len(x)), np.int32)
    lib.decompose64(out.reshape(-1), x, len(x), l, bgbit,
                    ctypes.c_uint64(offset))
    return out
